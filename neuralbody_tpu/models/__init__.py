from . import latent_xyzc, nerf, sparse_conv_net, tpose_xyzc  # noqa: F401  (registers plugins)
from .sparse_conv_net import EncoderStatic
from .latent_xyzc import ModelStatic

__all__ = ["latent_xyzc", "sparse_conv_net", "EncoderStatic", "ModelStatic"]
