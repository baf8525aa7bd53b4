"""Parameter initializers matching the torch defaults the reference relies on.

torch nn.Linear / nn.Conv2d default to kaiming_uniform(a=sqrt(5)) which reduces
to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias; the reference
GroupConv uses the same bound explicitly (src/models.py:161-169). Matching the
init distribution keeps training dynamics comparable for ELBO-parity runs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, dtype=jnp.float32,
                              minval=-bound, maxval=bound)


def linear_init(key: jax.Array, n_in: int, n_out: int, bias: bool = True) -> dict:
    """Weight stored (n_in, n_out) for x @ w; bias (n_out,)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(n_in)
    p = {"w": _uniform(kw, (n_in, n_out), bound)}
    if bias:
        p["b"] = _uniform(kb, (n_out,), bound)
    return p


def conv2d_init(key: jax.Array, in_channels: int, out_channels: int,
                kernel_size: int, bias: bool = True) -> dict:
    """Weight stored (out, in, k, k) (reference layout)."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kw, (out_channels, in_channels, kernel_size, kernel_size), bound)}
    if bias:
        p["b"] = _uniform(kb, (out_channels,), bound)
    return p


def groupconv_init(key: jax.Array, in_channels: int, out_channels: int,
                   kernel_size: int, input_rot_dim: int = 1,
                   bias: bool = True) -> dict:
    """Weight stored (out, in, rot_in, k, k) (reference src/models.py:151)."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size * kernel_size  # reference bound ignores rot_in
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": _uniform(kw, (out_channels, in_channels, input_rot_dim,
                            kernel_size, kernel_size), bound)}
    if bias:
        p["b"] = _uniform(kb, (out_channels,), bound)
    return p
