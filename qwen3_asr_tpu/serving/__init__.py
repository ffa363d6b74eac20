from .server import (
    ContinuousTranscriptionServer,
    ReplicatedTranscriptionServer,
    ServerStats,
    TranscriptionServer,
)

__all__ = [
    "TranscriptionServer",
    "ContinuousTranscriptionServer",
    "ReplicatedTranscriptionServer",
    "ServerStats",
]
