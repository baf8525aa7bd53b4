from .generator import generator_init, generator_apply
from .encoders import (
    encoder_init, encoder_apply, group_offsets, rotation_log_prior, attn_dim_for,
)
from .targetvae import TargetVAE

__all__ = [
    "generator_init", "generator_apply",
    "encoder_init", "encoder_apply", "group_offsets", "rotation_log_prior",
    "attn_dim_for", "TargetVAE",
]
