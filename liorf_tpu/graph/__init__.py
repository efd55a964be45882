from . import pose_graph

__all__ = ["pose_graph"]
