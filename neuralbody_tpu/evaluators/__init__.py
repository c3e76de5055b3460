from . import if_nerf  # noqa: F401  (registers plugins)
from .metrics import psnr, ssim

__all__ = ["if_nerf", "psnr", "ssim"]
