"""Coordinate grids and transforms vs the reference numpy constructions."""

import numpy as np
import jax.numpy as jnp

from targetvae_tpu.ops.coords import (
    image_grid, attention_grid, transform_coords, rotation_matrix)


def test_image_grid_matches_reference():
    d = 50
    xgrid = np.linspace(-1, 1, d)
    ygrid = np.linspace(1, -1, d)
    x0, x1 = np.meshgrid(xgrid, ygrid)
    ref = np.stack([x0.ravel(), x1.ravel()], 1)
    np.testing.assert_allclose(image_grid(d), ref, atol=1e-7)


def _ref_attention_grid(attn_dim, image_dim):
    """Direct transcription of reference train_mnist.py:112-121."""
    s = 2.0 / (image_dim - 1)
    d = attn_dim
    if d % 2:
        x_grid = np.arange(-s * (d // 2), s * (d // 2 + 1), s)
        y_grid = np.arange(-s * (d // 2), s * (d // 2 + 1), s)[::-1]
    else:
        x_grid = np.arange(-s * (d // 2), s * (d // 2), s)
        y_grid = np.arange(-s * (d // 2), s * (d // 2), s)[::-1]
    x0, x1 = np.meshgrid(x_grid, y_grid)
    return np.stack([x0.ravel(), x1.ravel()], 1)


def test_attention_grid_odd_even():
    for attn_dim, image_dim in [(39, 50), (40, 50), (65, 64), (23, 28), (43, 50)]:
        ref = _ref_attention_grid(attn_dim, image_dim)
        mine = attention_grid(attn_dim, image_dim)
        assert mine.shape == ref.shape == (attn_dim * attn_dim, 2)
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_attention_grid_fixes_arange_overshoot():
    """For (attn_dim=51, image_dim=50) — the reference's own mode-B MNIST
    shape — np.arange fp accumulation yields 52 values for a 51-cell map,
    which would crash the reference (train_mnist.py:114 bmm dim mismatch).
    Our fixed-count construction always returns attn_dim values."""
    ref = _ref_attention_grid(51, 50)
    assert ref.shape[0] == 52 * 52  # the reference bug
    mine = attention_grid(51, 50)
    assert mine.shape == (51 * 51, 2)
    # values agree on the first 51 entries of each axis
    s = 2.0 / 49
    np.testing.assert_allclose(mine[:51, 0], -s * 25 + s * np.arange(51),
                               atol=1e-5)


def test_transform_matches_reference_order():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 2).astype(np.float32)
    dx = rng.randn(3, 2).astype(np.float32)
    theta = rng.randn(3).astype(np.float32)
    out = np.asarray(transform_coords(jnp.asarray(x), jnp.asarray(dx),
                                      jnp.asarray(theta)))
    for b in range(3):
        c, s = np.cos(theta[b]), np.sin(theta[b])
        rot = np.array([[c, s], [-s, c]], dtype=np.float32)
        ref = (x - dx[b]) @ rot
        np.testing.assert_allclose(out[b], ref, atol=1e-5)


def test_rotation_matrix_layout():
    th = jnp.asarray([0.5])
    r = np.asarray(rotation_matrix(th))[0]
    assert np.allclose(r, [[np.cos(0.5), np.sin(0.5)],
                           [-np.sin(0.5), np.cos(0.5)]], atol=1e-6)
