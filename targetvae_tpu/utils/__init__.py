from .initializers import linear_init, conv2d_init, groupconv_init
from . import config  # noqa: F401

__all__ = ["linear_init", "conv2d_init", "groupconv_init", "config"]
