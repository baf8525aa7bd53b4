"""Lifted group conv: parity vs reference GroupConv and equivariance."""

import numpy as np
import jax.numpy as jnp
import pytest

from targetvae_tpu.ops.groupconv import lifted_conv2d, conv2d
from tests.conftest import requires_reference
from tests.helpers import to_bhwc


@requires_reference
def test_matches_reference_groupconv():
    torch = pytest.importorskip("torch")
    from tests.helpers import import_reference_models
    ref_models = import_reference_models()

    torch.manual_seed(0)
    B, C, n, k, R, out = 3, 1, 14, 9, 8, 6
    gc = ref_models.GroupConv(C, out, k, padding=4, input_rot_dim=1,
                              output_rot_dim=R)
    x = torch.randn(B, C, n, n)
    ref = gc(x, "cpu").detach().numpy()                 # (B, out, R, H', W')

    mine = lifted_conv2d(
        jnp.asarray(to_bhwc(x.numpy())),
        jnp.asarray(gc.weight.detach().numpy()),
        jnp.asarray(gc.bias.detach().numpy()),
        R=R, padding=4)                                  # (B, H', W', R, out)
    mine = np.transpose(np.asarray(mine), (0, 4, 3, 1, 2))
    np.testing.assert_allclose(mine, ref, atol=1e-4)


@requires_reference
def test_matches_reference_conv2d():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    torch.manual_seed(1)
    m = nn.Conv2d(2, 5, 7, padding=3)
    x = torch.randn(2, 2, 12, 12)
    ref = m(x).detach().numpy()
    mine = conv2d(jnp.asarray(to_bhwc(x.numpy())),
                  jnp.asarray(m.weight.detach().numpy()),
                  jnp.asarray(m.bias.detach().numpy()), padding=3)
    np.testing.assert_allclose(np.transpose(np.asarray(mine), (0, 3, 1, 2)),
                               ref, atol=1e-4)


def test_rotation_equivariance():
    """Rotating the input by 90 deg cyclically shifts the R axis (P4 lift)."""
    rng = np.random.RandomState(0)
    n, k, R = 12, 5, 4
    x = rng.randn(1, n, n, 1).astype(np.float32)
    w = rng.randn(4, 1, 1, k, k).astype(np.float32)

    y = np.asarray(lifted_conv2d(jnp.asarray(x), jnp.asarray(w), None, R=R,
                                 padding=k // 2))        # (1, H, W, R, out)

    # rotate image by +90 degrees (counter-clockwise in array terms)
    x_rot = np.rot90(x[0, :, :, 0], k=1)[None, :, :, None].copy()
    y_rot = np.asarray(lifted_conv2d(jnp.asarray(x_rot), jnp.asarray(w), None,
                                     R=R, padding=k // 2))

    # lifted feature maps: f(rot x)[r] = rot( f(x)[r+1 mod R] ) for P4
    for r in range(R):
        expect = np.rot90(y[0, :, :, (r + 1) % R, :], k=1, axes=(0, 1))
        got = y_rot[0, :, :, r, :]
        np.testing.assert_allclose(got, expect, atol=1e-3)


@requires_reference
def test_matches_reference_groupconv_rgb():
    """C_in=3 (galaxy) lifted conv parity."""
    torch = pytest.importorskip("torch")
    from tests.helpers import import_reference_models
    ref_models = import_reference_models()

    torch.manual_seed(3)
    B, C, n, k, R, out = 2, 3, 12, 7, 4, 5
    gc = ref_models.GroupConv(C, out, k, padding=3, input_rot_dim=1,
                              output_rot_dim=R)
    x = torch.randn(B, C, n, n)
    ref = gc(x, "cpu").detach().numpy()
    mine = lifted_conv2d(
        jnp.asarray(to_bhwc(x.numpy())),
        jnp.asarray(gc.weight.detach().numpy()),
        jnp.asarray(gc.bias.detach().numpy()),
        R=R, padding=3)
    mine = np.transpose(np.asarray(mine), (0, 4, 3, 1, 2))
    np.testing.assert_allclose(mine, ref, atol=1e-4)


@pytest.mark.parametrize("R", [8, 16])
def test_rotation_equivariance_higher_groups(R):
    """For P8/P16 the 90-degree rotation is the R/4-th group element, so it
    acts EXACTLY on the pixel grid: f(rot90 x)[r] = rot90(f(x)[r + R/4])."""
    rng = np.random.RandomState(1)
    n, k = 12, 5
    x = rng.randn(1, n, n, 1).astype(np.float32)
    w = rng.randn(3, 1, 1, k, k).astype(np.float32)

    y = np.asarray(lifted_conv2d(jnp.asarray(x), jnp.asarray(w), None, R=R,
                                 padding=k // 2))
    x_rot = np.rot90(x[0, :, :, 0], k=1)[None, :, :, None].copy()
    y_rot = np.asarray(lifted_conv2d(jnp.asarray(x_rot), jnp.asarray(w), None,
                                     R=R, padding=k // 2))
    s = R // 4
    for r in range(R):
        expect = np.rot90(y[0, :, :, (r + s) % R, :], k=1, axes=(0, 1))
        np.testing.assert_allclose(y_rot[0, :, :, r, :], expect, atol=1e-3)
