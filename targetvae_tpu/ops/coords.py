"""Coordinate grids and rigid 2-D transforms.

Replicates the coordinate conventions of the reference:
  - image grid in [-1, 1]^2 with y descending (reference train_mnist.py:475-479)
  - attention grid with odd/even pixel-count handling
    (reference train_mnist.py:112-121)
  - per-sample translate-then-rotate coordinate transform
    (reference train_mnist.py:70-78, 233-239)

All grids are built from static shapes at trace time; nothing round-trips to the
host inside a training step (the reference rebuilds these in numpy every
minibatch).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def image_grid(image_dim: int) -> np.ndarray:
    """Pixel-center coordinates in [-1,1]^2, y descending; shape (N, 2), N=dim^2.

    Matches np.meshgrid(linspace(-1,1,d), linspace(1,-1,d)) stacked as
    [x.ravel(), y.ravel()] in the reference.
    """
    xgrid = np.linspace(-1, 1, image_dim)
    ygrid = np.linspace(1, -1, image_dim)
    x0, x1 = np.meshgrid(xgrid, ygrid)
    coords = np.stack([x0.ravel(), x1.ravel()], axis=1)
    return coords.astype(np.float32)


@functools.lru_cache(maxsize=None)
def attention_grid(attn_dim: int, image_dim: int) -> np.ndarray:
    """Coordinates of attention-map cells; shape (attn_dim*attn_dim, 2).

    `btw_pixels_space` is the image-grid pixel pitch 2/(image_dim-1). The
    odd/even rules replicate reference train_mnist.py:112-121: odd grids span
    [-s*(d//2), s*(d//2)] inclusive; even grids span [-s*(d//2), s*(d//2 - 1)].
    y runs descending.
    """
    s = 2.0 / (image_dim - 1)
    d = attn_dim
    # Both the odd branch (stop = s*(d//2 + 1)) and the even branch
    # (stop = s*(d//2)) of the reference np.arange produce exactly the d values
    # start + i*s, i in range(d), so one formula covers both.
    x_grid = -s * (d // 2) + s * np.arange(d)
    y_grid = x_grid[::-1].copy()
    x0, x1 = np.meshgrid(x_grid, y_grid)
    coords = np.stack([x0.ravel(), x1.ravel()], axis=1)
    return coords.astype(np.float32)


def rotation_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    """Per-sample rotation matrices, (B,) -> (B, 2, 2).

    Layout matches the reference (train_mnist.py:73-77):
      [[cos, sin], [-sin, cos]]
    applied as x_new = x @ R.
    """
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    row0 = jnp.stack([c, s], axis=-1)
    row1 = jnp.stack([-s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def transform_coords(x: jnp.ndarray, dx: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Translate then rotate pixel coordinates.

    x: (N, 2) or (B, N, 2) base coordinates; dx: (B, 2); theta: (B,).
    Returns (B, N, 2): (x - dx) @ R(theta), matching the reference order
    (translate at train_mnist.py:70/125/222, rotate at :78/147/239).
    """
    if x.ndim == 2:
        x = x[None]
    x = x - dx[:, None, :]
    # elementwise 2x2 rotation (exact in f32; a (N,2)@(2,2) matmul would fall
    # into low-precision MXU paths for no benefit)
    c = jnp.cos(theta)[:, None]
    s = jnp.sin(theta)[:, None]
    x0, x1 = x[..., 0], x[..., 1]
    return jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
