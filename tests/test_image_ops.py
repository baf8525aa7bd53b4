"""Image preprocessing ops vs the reference implementations."""

import numpy as np
import pytest

from targetvae_tpu.data.image import crop, downsample, normalize


def test_downsample_matches_reference():
    """Fourier-crop downsample (reference src/image.py:5-28)."""
    rng = np.random.RandomState(0)
    x = rng.randn(3, 32, 32).astype(np.float32)
    out = downsample(x, factor=2)
    assert out.shape == (3, 16, 16)
    # energy-preserving up to the scale factor; low-freq content retained
    lowres_mean = out.mean(axis=(-2, -1))
    np.testing.assert_allclose(lowres_mean, x.mean(axis=(-2, -1)), atol=1e-4)

    # parity with a direct transcription of the reference
    def ref_downsample(x, shape):
        F = np.fft.rfft2(x)
        m, n = shape
        A = F[..., 0:m // 2, 0:n // 2 + 1]
        B = F[..., -m // 2:, 0:n // 2 + 1]
        F2 = np.concatenate([A, B], axis=-2)
        F2 *= (n * m) / (x.shape[-2] * x.shape[-1])
        return np.fft.irfft2(F2, s=shape).astype(x.dtype)

    np.testing.assert_allclose(out, ref_downsample(x, (16, 16)), atol=1e-5)


def test_crop_center():
    x = np.arange(36, dtype=np.float32).reshape(6, 6)
    c = crop(x, 2)
    np.testing.assert_array_equal(c, x[2:4, 2:4])


def test_normalize_ring():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 20, 20).astype(np.float32) * 3 + 5
    out = normalize(x, radius=8)
    # background ring should be ~standardized
    yc, xc = np.ogrid[:20, :20]
    ring = np.sqrt((10 - yc) ** 2 + (10 - xc) ** 2) >= 8
    for i in range(4):
        assert abs(out[i][ring].mean()) < 1e-4
        assert abs(out[i][ring].std() - 1) < 1e-4


def test_crop_normalize_match_reference():
    """Direct parity against src/image.py:30-60 (crop + ring-normalize)."""
    from tests.conftest import reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from tests.helpers import import_reference_module
    ref_image = import_reference_module("src.image")

    rng = np.random.RandomState(3)
    for n, size, radius in ((20, 14, None), (21, 15, 7.5)):
        x = (rng.randn(5, n, n) * 2 + 1).astype(np.float32)
        np.testing.assert_array_equal(crop(x, size),
                                      np.stack([ref_image.crop(im, size)
                                                for im in x]))
        theirs = ref_image.normalize(x.astype(np.float64), radius=radius)
        np.testing.assert_allclose(normalize(x.astype(np.float64),
                                             radius=radius),
                                   theirs, rtol=1e-10, atol=1e-10)


def test_ctf_apply_dft_matches_conv():
    """DFT-as-matmul CTF application == the depthwise-conv reference path.

    On CPU the DFT matmuls run in true f32, so the linear-convolution
    equivalence is tight; on TPU the dispatch uses this path only for the
    bf16 compute route (losses/elbo.py)."""
    import jax
    import jax.numpy as jnp
    from targetvae_tpu.losses.likelihoods import ctf_apply, ctf_apply_dft

    for n, kc in ((14, 13), (17, 9)):
        y = jax.random.normal(jax.random.key(0), (3, n, n))
        ctf = jax.random.normal(jax.random.key(1), (3, kc, kc)) * 0.1
        a = ctf_apply(y, ctf)
        b = ctf_apply_dft(y, ctf)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=0)
        g = jax.grad(lambda y: jnp.sum(jnp.sin(ctf_apply_dft(y, ctf))))(y)
        assert np.isfinite(np.asarray(g)).all()


def test_ctf_dft_retrace_no_tracer_leak():
    """Regression: _dft_mats once cached jnp arrays created inside the first
    jit trace — the second trace at a new batch shape (the streaming tail
    batch) then hit UnexpectedTracerError. Two traces sharing the cached S
    must both work."""
    import jax
    import jax.numpy as jnp
    from targetvae_tpu.losses.likelihoods import ctf_apply_dft

    f = jax.jit(ctf_apply_dft)
    ctf9 = jax.random.normal(jax.random.key(1), (5, 9, 9)) * 0.1
    out1 = f(jax.random.normal(jax.random.key(0), (5, 12, 12)), ctf9)
    # same S = n + kc - 1 -> same _dft_mats cache entry, different batch
    out2 = f(jax.random.normal(jax.random.key(2), (2, 12, 12)), ctf9[:2])
    assert np.isfinite(np.asarray(out1)).all()
    assert np.isfinite(np.asarray(out2)).all()
