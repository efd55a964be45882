from . import keyframes

__all__ = ["keyframes"]
