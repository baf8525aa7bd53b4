"""Contrast-transfer-function synthesis for cryo-EM particles.

Same physics as reference src/ctf.py:6-55 (astigmatic defocus, phase
gamma = 2*pi*(-df*lam*s^2/2 + cs*lam^3*s^4/4), amplitude-contrast mixing,
optional B-factor envelope) but fully vectorized: the reference evaluates and
inverse-FFTs one particle at a time in a Python loop; here all N particles are
evaluated in one broadcast expression and one batched ifft2 — orders of
magnitude faster for EMPIAR-scale stacks (tests/test_ctf.py checks parity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

CTF_COLUMNS = ["defocus", "cs", "voltage", "apix", "bfactor", "ampcont",
               "dfdiff", "dfang"]


def parse_ctf(path) -> pd.DataFrame:
    """Whitespace-separated CTF parameter file -> DataFrame (src/ctf.py:26-29)."""
    df = pd.read_csv(path, sep=r"\s+", header=None)
    df.columns = CTF_COLUMNS
    return df


def compute_2d_ctf(freqs: np.ndarray, dfu, dfv, dfang, volt, cs, w,
                   bfactor=None) -> np.ndarray:
    """CTF over frequency pairs. freqs: (..., M, 2); scalar or (N,1) params.

    Broadcasts over a leading particle axis, unlike the reference scalar-only
    version.
    """
    volt = np.asarray(volt, dtype=np.float64) * 1000.0
    cs = np.asarray(cs, dtype=np.float64) * 1e7
    lam = 12.2639 / np.sqrt(volt + 0.97845e-6 * volt ** 2)
    x = freqs[..., 0]
    y = freqs[..., 1]
    ang = np.arctan2(y, x)
    s2 = x ** 2 + y ** 2
    df = 0.5 * (dfu + dfv + (dfu - dfv) * np.cos(2 * (ang - dfang)))
    gamma = 2 * np.pi * (-0.5 * df * lam * s2 + 0.25 * cs * lam ** 3 * s2 ** 2)
    ctf = np.sqrt(1 - w ** 2) * np.sin(gamma) - w * np.cos(gamma)
    if bfactor is not None:
        ctf = ctf * np.exp(-np.asarray(bfactor, dtype=np.float64) / 4 * s2)
    return ctf.astype(freqs.dtype)


def ctf_filter(ctf_params: pd.DataFrame, n: int, m: int, scale: float = 1.0
               ) -> np.ndarray:
    """Real-space CTF kernels (N, n, m) = -fftshift(ifft2(CTF)).real.

    Consumed as per-particle convolution kernels (train_particles.py:298-302).
    Vectorized across all particles in one pass.
    """
    theta = np.fft.fftfreq(n)
    gamma = np.fft.fftfreq(m)
    tg, gg = np.meshgrid(theta, gamma, indexing="ij")
    freqs = np.stack([tg.ravel(), gg.ravel()], axis=1)  # float64: the CTF
    # phase is evaluated in double precision (parity with the reference;
    # float32 phase wobbles the kernels by ~1e-3 relative)

    apix = (ctf_params["apix"].to_numpy() * scale)[:, None]          # (N,1)
    f = freqs[None] / apix[..., None]                                 # (N, nm, 2)
    dfu = (ctf_params["defocus"].to_numpy() * 10000.0)[:, None]
    dfang = (2 * np.pi * ctf_params["dfang"].to_numpy() / 360.0)[:, None]
    volt = ctf_params["voltage"].to_numpy()[:, None]
    cs = ctf_params["cs"].to_numpy()[:, None]
    w = (ctf_params["ampcont"].to_numpy() / 100.0)[:, None]
    bf = ctf_params["bfactor"].to_numpy()[:, None]

    c = compute_2d_ctf(f, dfu, dfu, dfang, volt, cs, w, bf)           # (N, nm)
    c = c.reshape(-1, n, m)
    kern = -np.fft.fftshift(np.fft.ifft2(c), axes=(-2, -1)).real
    return kern.astype(np.float32)
