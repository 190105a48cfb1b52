"""r2dm_tpu: a TPU-native (JAX/XLA/Pallas) LiDAR diffusion framework.

Re-designed from-scratch counterpart of kazuto1011/r2dm ("LiDAR Data
Synthesis with Denoising Diffusion Probabilistic Models", ICRA 2024):
range-image DDPMs over equirectangular LiDAR scans with RePaint completion
and a full generative-metrics evaluation stack — built TPU-first (NHWC,
bf16 MXU compute, scan-compiled samplers, mesh data-parallelism over ICI).
"""

from . import config, diffusion, lidar, models, ops
from .config import Config
from .inference import DDPM, pretrained_r2dm, setup_model
from .lidar import LiDARUtility

__version__ = "0.1.0"

__all__ = [
    "Config",
    "DDPM",
    "LiDARUtility",
    "config",
    "diffusion",
    "lidar",
    "models",
    "ops",
    "pretrained_r2dm",
    "setup_model",
]
