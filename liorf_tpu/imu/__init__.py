from . import fusion, preintegration

__all__ = ["preintegration", "fusion"]
