from .encoding import (
    fourier_feature_frequencies,
    fourier_features,
    fourier_features_channels,
    generate_polar_coords,
    get_hdl64e_linear_ray_angles,
    spherical_harmonics,
    timestep_embedding,
)
from .pad import ring_pad
from .resample import downsample2x, fir_resample, upsample2x

__all__ = [
    "ring_pad",
    "fir_resample",
    "upsample2x",
    "downsample2x",
    "generate_polar_coords",
    "get_hdl64e_linear_ray_angles",
    "fourier_feature_frequencies",
    "fourier_features",
    "fourier_features_channels",
    "spherical_harmonics",
    "timestep_embedding",
]
