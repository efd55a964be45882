from . import geodesy, pointcloud, se3, voxel
from .pointcloud import PAD_COORD, PointCloud, make_cloud

__all__ = [
    "se3",
    "voxel",
    "geodesy",
    "pointcloud",
    "PointCloud",
    "make_cloud",
    "PAD_COORD",
]
