"""Lifting group convolution C -> P_R, lowered to one MXU conv.

The reference (src/models.py:132-225) rebuilds R rotated filter copies with
grid_sample every forward, then runs one big F.conv2d in NCHW. Here the
rotations come from static gather tables (ops/rotate.py) and the conv runs in
channels-last NHWC/HWIO layout — the natural layout for XLA:TPU — with the
output rotation axis laid out r-major so the (R, out) split is a free reshape
(no transpose traffic). Kernel sizes in this model family are ~image-sized
(k = 28..65), so the conv is effectively an im2col matmul that XLA tiles onto
the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .rotate import rotate_filter_bank


def conv2d(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
           stride: int = 1, padding: int = 0,
           compute_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Plain 2-D conv, channels last.

    x: (B, H, W, C_in); weight: (out, in, k, k) (reference Conv2d layout);
    returns (B, H', W', out).
    """
    rhs = jnp.transpose(weight, (2, 3, 1, 0))  # (k, k, in, out)
    y = _conv(x, rhs, stride, padding, compute_dtype)
    if bias is not None:
        y = y + bias
    return y


def _conv(x, rhs, stride, padding, compute_dtype, groups: int = 1):
    """conv_general_dilated with mixed-precision handling.

    With a low-precision compute dtype, inputs AND output are cast (the MXU
    still accumulates in f32 internally); asking for an f32 output via
    preferred_element_type would break the autodiff transpose rule, which
    feeds the f32 cotangent back into a bf16 conv.
    """
    kwargs = {}
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        rhs = rhs.astype(compute_dtype)
    else:
        kwargs["preferred_element_type"] = jnp.float32
    y = jax.lax.conv_general_dilated(
        x, rhs,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        **kwargs,
    )
    return y.astype(jnp.float32)


def lifted_conv2d(x: jnp.ndarray, weight: jnp.ndarray, bias: Optional[jnp.ndarray],
                  R: int, stride: int = 1, padding: int = 0,
                  compute_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """Lifting group conv.

    x: (B, H, W, C_in * rot_in) channels last.
    weight: (out, in, rot_in, k, k) — the reference GroupConv parameter layout
      (src/models.py:151), kept so checkpoints carry reference semantics.
    Returns (B, H', W', R, out): rotation axis explicit, 'out' innermost so the
    128-channel head matmuls ride the 128-lane axis.
    """
    out, cin, rot_in, k, _ = weight.shape
    rot = rotate_filter_bank(weight, R)  # (R, out, in, rot_in, k, k)
    rhs = jnp.transpose(rot, (4, 5, 2, 3, 0, 1)).reshape(k, k, cin * rot_in, R * out)
    y = _conv(x, rhs, stride, padding, compute_dtype)
    b_, hp, wp, _ = y.shape
    y = y.reshape(b_, hp, wp, R, out)
    if bias is not None:
        y = y + bias  # (out,) broadcasts over (.., R, out)
    return y
