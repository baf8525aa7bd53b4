"""Native host data runtime: parity with the numpy path."""

import numpy as np
import pytest

from targetvae_tpu.data import mrc
from targetvae_tpu.data import native
from targetvae_tpu.data.datasets import preprocess_particles


@pytest.fixture(scope="module")
def stack(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mrc") / "stack.mrcs")
    arr = np.random.RandomState(0).randn(40, 22, 22).astype(np.float32)
    mrc.write(path, arr)
    return path, arr


def test_native_available():
    # the toolchain exists in this environment, so the auto-build must work
    assert native.available()


def test_native_mrc_load_plain(stack):
    path, arr = stack
    out = native.load_mrc_f32(path)
    np.testing.assert_allclose(out, arr, atol=1e-6)


def test_native_mrc_load_crop_normalize(stack):
    path, arr = stack
    out = native.load_mrc_f32(path, crop=16, normalize=True)
    ref = preprocess_particles(arr, crop=16, normalize=True)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_native_mrc_int16(tmp_path):
    path = str(tmp_path / "i16.mrcs")
    arr = (np.random.RandomState(1).randn(8, 12, 12) * 100).astype(np.int16)
    mrc.write(path, arr)
    out = native.load_mrc_f32(path)
    np.testing.assert_allclose(out, arr.astype(np.float32), atol=1e-5)


def test_native_gather(stack):
    _, arr = stack
    idx = np.random.RandomState(2).permutation(len(arr))[:17]
    out = native.gather_f32(arr, idx)
    np.testing.assert_array_equal(out, arr[idx])
