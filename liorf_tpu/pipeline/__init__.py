from .config import SlamConfig, load_config
from .slam import LiorfPipeline

__all__ = ["SlamConfig", "load_config", "LiorfPipeline"]
