"""Core numeric ops: pure jax.numpy, no framework dependencies."""

from .coords import image_grid, attention_grid, transform_coords, rotation_matrix
from .rotate import rotation_tables, rotate_filter_bank
from .fourier import fourier_init, fourier_apply
from .gumbel import gumbel_softmax
from .kl import normal_kl, normal_log_prob, guarded_moments
from .groupconv import lifted_conv2d, conv2d

__all__ = [
    "image_grid", "attention_grid", "transform_coords", "rotation_matrix",
    "rotation_tables", "rotate_filter_bank",
    "fourier_init", "fourier_apply",
    "gumbel_softmax",
    "normal_kl", "normal_log_prob", "guarded_moments",
    "lifted_conv2d", "conv2d",
]
