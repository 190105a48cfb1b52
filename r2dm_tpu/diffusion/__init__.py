from . import schedules
from .base import (
    GaussianDiffusion,
    as_typed_key,
    key_batch_from_seeds,
    normal,
    split_key,
)
from .continuous import ContinuousTimeGaussianDiffusion
from .discrete import DiscreteTimeGaussianDiffusion
from .flow import RectifiedFlow

__all__ = [
    "schedules",
    "GaussianDiffusion",
    "ContinuousTimeGaussianDiffusion",
    "DiscreteTimeGaussianDiffusion",
    "RectifiedFlow",
    "as_typed_key",
    "key_batch_from_seeds",
    "normal",
    "split_key",
]
