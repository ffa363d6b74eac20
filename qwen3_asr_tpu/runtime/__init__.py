from .generate import Generator, GenerationResult

__all__ = ["Generator", "GenerationResult"]
