from . import synthetic, types
from .types import GpsFix, ImuSample, LidarScan

__all__ = ["types", "synthetic", "LidarScan", "ImuSample", "GpsFix"]
