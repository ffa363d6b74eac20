from .server import ServerStats, TranscriptionServer

__all__ = ["TranscriptionServer", "ServerStats"]
