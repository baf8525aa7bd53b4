"""TARGET-VAE TPU: a TPU-native (JAX/XLA/Pallas) framework for translation- and
rotation-group equivariant VAEs.

Re-implements the full capability surface of the SMLC-NYSBC/TARGET-VAE reference
(arXiv:2210.12918) with a TPU-first design: group-equivariant encoders built from
static rotation-resampling tables + MXU-lowered lifted convolutions, a fused joint
translation x rotation posterior, a coordinate-MLP decoder, pjit/shard_map data and
tensor parallelism, and a host-side data pipeline for MRC / CTF cryo-EM data.
"""

__version__ = "0.1.0"

from . import ops, models, losses, data, train, parallel, utils  # noqa: F401
