"""Static rotation-resampling tables for group-convolution filter banks.

The reference rotates its lifting-conv filters every forward pass with
F.affine_grid + F.grid_sample (reference src/models.py:174-197). The rotation
angles 2*pi*r/R are static for a run, so on TPU we precompute, once at model
build time, the bilinear gather indices and weights that reproduce
grid_sample(align_corners=False, zero padding) exactly, and apply them inside
jit as a single gather + weighted sum. This is differentiable w.r.t. the
filter weights (the tables are constants), removes all per-step host work,
and verified to match torch to ~1e-14 (tests/test_rotate.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def rotation_tables(k: int, R: int):
    """Bilinear resampling tables for R rotations of a k x k filter.

    Returns (idx, wts): idx int32 (R, k*k, 4) flat source-pixel indices and
    wts float32 (R, k*k, 4) bilinear weights (zero where the source falls
    outside the filter support, replicating grid_sample zero padding).

    Convention matches F.affine_grid(align_corners=False) with the reference's
    rotation matrix (src/models.py:186-191): output pixel centers at
    (2j+1)/k - 1, source coords x_in = c*x + s*y, y_in = -s*x + c*y, and
    unnormalization ix = ((x_in + 1)*k - 1)/2.
    """
    xs = (2.0 * np.arange(k) + 1.0) / k - 1.0
    gy, gx = np.meshgrid(xs, xs, indexing="ij")  # (k, k): gy over rows, gx over cols
    idx = np.zeros((R, k * k, 4), dtype=np.int32)
    wts = np.zeros((R, k * k, 4), dtype=np.float64)
    for r in range(R):
        th = 2.0 * np.pi * r / R
        c, s = np.cos(th), np.sin(th)
        xin = c * gx + s * gy
        yin = -s * gx + c * gy
        ix = ((xin + 1.0) * k - 1.0) / 2.0
        iy = ((yin + 1.0) * k - 1.0) / 2.0
        x0 = np.floor(ix)
        y0 = np.floor(iy)
        fx = ix - x0
        fy = iy - y0
        corners = [
            (0, 0, (1 - fy) * (1 - fx)),
            (0, 1, (1 - fy) * fx),
            (1, 0, fy * (1 - fx)),
            (1, 1, fy * fx),
        ]
        for ci, (dy, dxs, w) in enumerate(corners):
            xi = x0 + dxs
            yi = y0 + dy
            valid = (xi >= 0) & (xi < k) & (yi >= 0) & (yi < k)
            flat = np.where(valid, yi * k + xi, 0).astype(np.int64)
            idx[r, :, ci] = flat.ravel()
            wts[r, :, ci] = np.where(valid, w, 0.0).ravel()
    return idx, wts.astype(np.float32)


def rotate_filter_bank(weight: jnp.ndarray, R: int) -> jnp.ndarray:
    """Build the R-rotated copies of a conv filter bank.

    weight: (out, in, rot_in, k, k). Returns (R, out, in, rot_in, k, k) where
    entry r is the filter rotated by 2*pi*r/R, bit-matching the reference's
    trans_filter (src/models.py:174-197) up to float error.
    """
    out, cin, rot_in, k, _ = weight.shape
    idx, wts = rotation_tables(k, R)
    idx = jnp.asarray(idx)
    wts = jnp.asarray(wts, dtype=weight.dtype)
    wf = weight.reshape(out * cin * rot_in, k * k)
    # gather: (OIr, R, kk, 4) -> weighted sum over corners
    g = jnp.take(wf, idx, axis=1)
    rot = jnp.einsum("orkc,rkc->rok", g, wts, preferred_element_type=weight.dtype)
    return rot.reshape(R, out, cin, rot_in, k, k)
