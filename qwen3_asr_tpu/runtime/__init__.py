from .generate import Generator

__all__ = ["Generator"]
