from . import detector

__all__ = ["detector"]
