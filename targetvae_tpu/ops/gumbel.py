"""Gumbel-softmax sampling on explicit PRNG keys.

Matches F.gumbel_softmax(logits, tau=1, hard=False, dim=-1) as used by the
reference encoders (src/models.py:312, :387): softmax((logits + g)/tau) with
g standard Gumbel noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(key: jax.Array, logits: jnp.ndarray, tau: float = 1.0,
                   axis: int = -1) -> jnp.ndarray:
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    return jax.nn.softmax((logits + g) / tau, axis=axis)
