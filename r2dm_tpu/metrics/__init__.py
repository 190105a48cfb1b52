from . import bev, distribution
from .extractor import pointnet, postprocess, rangenet

__all__ = ["bev", "distribution", "pointnet", "postprocess", "rangenet"]
