"""Reconstruction likelihood heads.

Centralizes the per-dataset likelihood deltas the reference copy-pastes into
four eval_minibatch bodies (SURVEY.md section 2.4): Bernoulli (BCE-with-logits,
reference train_mnist.py:286-292 and the RGB variant train_galaxy.py:286-291),
and Gaussian / heteroscedastic Gaussian with optional per-particle CTF
application and circular masking (reference train_particles.py:284-341).

Images are channels-last (B, H, W, C); the generator output is pixel-major
(B, N, n_out), so Bernoulli terms pair y_hat[b, n, c] with the true pixel
value at (n, c). (For RGB the reference's .view pairing is only consistent if
the source npy is (N, H, W, 3); we adopt that interpretation explicitly.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCE-with-logits, the numerically-stable form torch uses."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


@functools.lru_cache(maxsize=None)
def _dft_mats(S: int):
    """NUMPY only — a cached jnp.asarray created inside one jit trace is a
    leaked tracer in the next trace (hit by the streaming tail-batch retrace;
    jnp conversion happens at each use site, where it is a per-trace
    constant)."""
    u = np.arange(S)
    W = np.exp(-2j * np.pi * np.outer(u, u) / S).astype(np.complex64)
    Wi = (np.exp(2j * np.pi * np.outer(u, u) / S) / S).astype(np.complex64)
    return W, Wi


def ctf_apply_dft(y_img: jnp.ndarray, ctf: jnp.ndarray) -> jnp.ndarray:
    """ctf_apply via DFT-as-matmul: exact linear convolution through a
    zero-padded circular convolution, with the DFTs done as dense complex
    matmuls on the MXU (this backend has no device FFT, and XLA's depthwise
    conv with image-sized per-image kernels runs at 0.44 TF/s: 33 ms fwd /
    93 ms fwd+bwd at the EMPIAR scale vs 2.8 / 2.9 ms for this path).
    Numerics: ~6e-3 relative (f32 DFT roundoff at S~218 + default matmul
    precision) — used on the bf16 compute path only, whose own rounding is
    the same order; the f32 path keeps the exact conv."""
    b, n, _ = y_img.shape
    kc = ctf.shape[-1]
    pad = kc // 2
    S = n + kc - 1
    W_np, Wi_np = _dft_mats(S)
    W, Wi = jnp.asarray(W_np), jnp.asarray(Wi_np)
    yp = jnp.pad(y_img, ((0, 0), (0, S - n), (0, S - n)))
    # torch conv2d is cross-correlation -> flip the kernel for convolution
    kp = jnp.pad(ctf[:, ::-1, ::-1], ((0, 0), (0, S - kc), (0, S - kc)))
    e = lambda A, x, Bm: jnp.einsum("uv,bvj,jw->buw", A, x, Bm)
    Yf = e(W, yp.astype(jnp.complex64), W.T)
    Kf = e(W, kp.astype(jnp.complex64), W.T)
    return e(Wi, Yf * Kf, Wi.T).real[:, pad:pad + n, pad:pad + n]


def ctf_apply(y_img: jnp.ndarray, ctf: jnp.ndarray) -> jnp.ndarray:
    """Convolve each image with its own real-space CTF kernel.

    y_img: (B, n, n); ctf: (B, kc, kc) with kc odd. The reference does this as
    a grouped F.conv2d with groups=B (train_particles.py:298-302); on TPU it is
    a depthwise conv: batch mapped onto the channel axis.
    Note torch's conv2d is cross-correlation; lax 'conv' dimension numbers with
    default rhs_dilation match that (no kernel flip).
    """
    b, n, _ = y_img.shape
    kc = ctf.shape[-1]
    pad = kc // 2
    lhs = jnp.transpose(y_img, (1, 2, 0))[None]          # (1, n, n, B)
    rhs = jnp.transpose(ctf, (1, 2, 0))[:, :, None, :]   # (kc, kc, 1, B)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b,
        preferred_element_type=jnp.float32,
    )
    return jnp.transpose(out[0], (2, 0, 1))              # (B, n, n)


def circular_mask(dx: jnp.ndarray, n: int, radius: int,
                  btw_pixels_space: float) -> jnp.ndarray:
    """Boolean mask (B, n*n): pixels within `radius` of the inferred center.

    Replicates reference train_particles.py:309-333 (pixel grid
    x: arange(-n//2, n//2), y: arange(n//2, -n//2, -1); center = dx / pitch)
    but entirely on-device — the reference round-trips dx to the host every
    batch. No gradient flows through the mask (dx is stop_gradient'ed, as the
    reference detaches).
    """
    import numpy as np
    x_img = np.arange(-(n // 2), n - (n // 2), 1, dtype=np.float32)
    # reference uses np.arange(n//2, -n//2, -1), which matches this for even n
    # but yields n-1 values (a shape error) for odd n; this form fixes odd n
    y_img = np.arange(n // 2, n // 2 - n, -1, dtype=np.float32)
    xg, yg = np.meshgrid(x_img, y_img)
    grid = jnp.asarray(np.stack([xg.ravel(), yg.ravel()], 1))  # (n*n, 2)
    center = jax.lax.stop_gradient(dx) / btw_pixels_space       # (B, 2)
    d2 = jnp.sum((center[:, None, :] - grid[None]) ** 2, axis=-1)
    return jnp.sqrt(d2) < radius


def reconstruction_log_prob(y_hat: jnp.ndarray, y: jnp.ndarray, kind: str,
                            fit_noise: bool = False,
                            ctf: Optional[jnp.ndarray] = None,
                            dx: Optional[jnp.ndarray] = None,
                            mask_radius: int = 0,
                            btw_pixels_space: float = 0.0,
                            ctf_dft: bool = False,
                            row_weights: Optional[jnp.ndarray] = None,
                            ) -> jnp.ndarray:
    """Batch-mean reconstruction log-likelihood.

    y_hat: (B, N, n_out) generator output; y: (B, H, W, C) targets.

    row_weights: optional (B,) per-image weights. When given, the batch mean
    becomes the weighted SUM of per-image log-likelihoods — the caller owns
    the normalization (e.g. 1/n_real for zero-weight-padded ragged tail
    batches on meshes, train/loop.py)."""
    b = y.shape[0]
    n = y.shape[1]

    if kind == "bernoulli":
        c = y.shape[-1]
        logits = y_hat.reshape(b, -1)
        targets = y.reshape(b, -1)
        size = targets.shape[1]
        # -BCE_mean * size (reference train_mnist.py:291); RGB uses size=N*3
        # (train_galaxy.py:289-291) which this reduces to as well.
        if row_weights is not None:
            return -jnp.dot(row_weights,
                            jnp.sum(_bce_with_logits(logits, targets), axis=1))
        return -jnp.mean(_bce_with_logits(logits, targets)) * size

    # gaussian (particles)
    y_flat = y.reshape(b, -1)
    y_mu = y_hat[..., 0].reshape(b, -1)
    y_var = y_logvar = None
    if fit_noise:
        y_logvar = y_hat[..., 1].reshape(b, -1)
        y_var = jnp.exp(y_logvar)

    if ctf is not None:
        _ctf = ctf_apply_dft if ctf_dft else ctf_apply
        y_mu = _ctf(y_mu.reshape(b, n, n), ctf).reshape(b, -1)
        if y_var is not None:
            # reference semantics (train_particles.py:295-296, 304-307, 336):
            # the CTF is applied to the *variance* while the +logvar term keeps
            # the pre-conv logvar — we keep that pairing (the reference's
            # groups=1 conv there is additionally shape-broken; we use the
            # intended per-particle depthwise conv)
            y_var = _ctf(y_var.reshape(b, n, n), ctf).reshape(b, -1)

    mask = None
    if mask_radius > 0:
        assert dx is not None
        mask = circular_mask(dx, n, mask_radius, btw_pixels_space)
        y_flat = jnp.where(mask, y_flat, 0.0)
        y_mu = jnp.where(mask, y_mu, 0.0)

    if y_var is not None:
        term = (y_mu - y_flat) ** 2 / y_var + y_logvar
        if mask is not None:
            term = jnp.where(mask, term, 0.0)
        per_row = jnp.sum(term, axis=1)
    else:
        per_row = jnp.sum((y_mu - y_flat) ** 2, axis=1)
    if row_weights is not None:
        return -0.5 * jnp.dot(row_weights, per_row)
    return -0.5 * jnp.mean(per_row)
