"""Rotation-resampling tables vs torch affine_grid+grid_sample golden values."""

import numpy as np
import jax.numpy as jnp
import pytest

from targetvae_tpu.ops.rotate import rotation_tables, rotate_filter_bank
from tests.conftest import requires_reference


@pytest.mark.parametrize("k,R", [(5, 4), (11, 8), (28, 8), (16, 16),
                                 (28, 16)])
def test_rotation_matches_grid_sample(k, R):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    torch.manual_seed(0)
    w = torch.randn(3, 2, 1, k, k)

    res = torch.zeros(R, 3, 2, 1, k, k)
    th = 0.0
    for i in range(R):
        rot = torch.zeros(3, 3, 4)
        rot[:, 0, 0] = np.cos(th)
        rot[:, 0, 1] = np.sin(th)
        rot[:, 1, 0] = -np.sin(th)
        rot[:, 1, 1] = np.cos(th)
        grid = F.affine_grid(rot, list(w.shape), align_corners=False)
        res[i] = F.grid_sample(w, grid, align_corners=False)
        th += 2 * np.pi / R

    mine = np.asarray(rotate_filter_bank(jnp.asarray(w.numpy()), R))
    np.testing.assert_allclose(mine, res.numpy(), atol=2e-5)


def test_identity_rotation_is_exact():
    idx, wts = rotation_tables(9, 4)
    # r=0 must be the identity resampling
    assert (wts[0].sum(-1) == 1).all()
    w = np.random.RandomState(0).randn(2, 1, 1, 9, 9).astype(np.float32)
    rot = np.asarray(rotate_filter_bank(jnp.asarray(w), 4))
    np.testing.assert_allclose(rot[0], w, atol=1e-6)


def test_four_fold_rotation_is_permutation():
    # 90-degree rotations of a grid are exact permutations (no interpolation)
    w = np.random.RandomState(1).randn(1, 1, 1, 8, 8).astype(np.float32)
    rot = np.asarray(rotate_filter_bank(jnp.asarray(w), 4))
    # rotating the result by the inverse permutation recovers the original:
    # check energy is conserved exactly for r=1,2,3
    for r in range(4):
        np.testing.assert_allclose(np.sort(rot[r].ravel()),
                                   np.sort(w.ravel()), atol=1e-6)


@requires_reference
def test_matches_reference_trans_filter():
    torch = pytest.importorskip("torch")
    from tests.helpers import import_reference_models
    ref_models = import_reference_models()

    torch.manual_seed(2)
    gc = ref_models.GroupConv(2, 3, 9, padding=4, input_rot_dim=1,
                              output_rot_dim=8)
    ref = gc.trans_filter("cpu").detach().numpy()       # (out, R, in, 1, k, k)
    mine = np.asarray(rotate_filter_bank(
        jnp.asarray(gc.weight.detach().numpy()), 8))    # (R, out, in, 1, k, k)
    np.testing.assert_allclose(np.transpose(mine, (1, 0, 2, 3, 4, 5)), ref,
                               atol=2e-5)
