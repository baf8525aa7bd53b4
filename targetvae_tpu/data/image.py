"""Host-side image preprocessing: Fourier downsample, crop, ring-normalize.

Same behavior as reference src/image.py:5-60, vectorized (the reference
normalizes in a per-image Python loop).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def downsample(x: np.ndarray, factor: float = 1,
               shape: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Fourier-crop downsample of (..., H, W)."""
    if shape is None:
        m, n = x.shape[-2:]
        shape = (int(m / factor), int(n / factor))
    F = np.fft.rfft2(x)
    m, n = shape
    A = F[..., 0:m // 2, 0:n // 2 + 1]
    B = F[..., -m // 2:, 0:n // 2 + 1]
    F = np.concatenate([A, B], axis=-2)
    F *= (n * m) / (x.shape[-2] * x.shape[-1])
    f = np.fft.irfft2(F, s=shape)
    return f.astype(x.dtype)


def crop(stack: np.ndarray, size: int) -> np.ndarray:
    """Center crop the last two axes to (size, size)."""
    n, m = stack.shape[-2:]
    si = (n - size) // 2
    sj = (m - size) // 2
    return stack[..., si:si + size, sj:sj + size]


def normalize(stack: np.ndarray, radius: Optional[float] = None) -> np.ndarray:
    """Standardize each image using the outside-radius background ring."""
    n, m = stack.shape[-2:]
    if radius is None:
        radius = min(n, m) / 2
    center = np.array([n / 2, m / 2])
    yc, xc = np.ogrid[:n, :m]
    dist = np.sqrt((center[0] - yc) ** 2 + (center[1] - xc) ** 2)
    ring = dist >= radius
    flat = stack.reshape(-1, n * m)
    sel = flat[:, ring.ravel()]
    mu = sel.mean(axis=1, keepdims=True)
    std = sel.std(axis=1, keepdims=True)
    out = (flat - mu) / std
    return out.reshape(stack.shape)
