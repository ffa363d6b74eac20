from .engine import DecodeEngine, EngineStats, SlotRequest
from .generate import Generator

__all__ = ["Generator", "DecodeEngine", "EngineStats", "SlotRequest"]
