"""Random Fourier feature embedding of 2-D coordinates.

Replicates reference src/models.py:33-58: z = cos(x @ (W/sigma)^T + b) with
W ~ N(0,1) of shape (embedding_dim, in_dim) and b ~ U(0, 2*pi). W and b are
non-trainable buffers: they are sampled once at model init, stored in the
checkpoint, and excluded from gradients via stop_gradient at apply time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fourier_init(key: jax.Array, in_dim: int = 2, embedding_dim: int = 1024) -> dict:
    kw, kb = jax.random.split(key)
    # stored transposed (in_dim, embedding_dim) for x @ W layout on the MXU
    w = jax.random.normal(kw, (in_dim, embedding_dim), dtype=jnp.float32)
    b = jax.random.uniform(kb, (embedding_dim,), dtype=jnp.float32) * 2.0 * np.pi
    return {"w": w, "b": b}


def fourier_apply(params: dict, x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """x: (..., in_dim) -> (..., embedding_dim). sigma divides W at apply time
    (reference src/models.py:57)."""
    w = jax.lax.stop_gradient(params["w"])
    b = jax.lax.stop_gradient(params["b"])
    proj = jnp.dot(x, w / jnp.asarray(sigma, x.dtype), preferred_element_type=x.dtype)
    return jnp.cos(proj + b)
