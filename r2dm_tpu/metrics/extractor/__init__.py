from . import pointnet, postprocess, rangenet

__all__ = ["pointnet", "postprocess", "rangenet"]
