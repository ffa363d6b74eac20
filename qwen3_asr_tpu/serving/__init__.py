from .server import (
    ContinuousTranscriptionServer,
    ServerStats,
    TranscriptionServer,
)

__all__ = [
    "TranscriptionServer",
    "ContinuousTranscriptionServer",
    "ServerStats",
]
