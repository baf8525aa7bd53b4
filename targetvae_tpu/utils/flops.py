"""Analytic per-step FLOP accounting and MFU.

Counts the algorithmic FLOPs of one training step (forward + backward + Adam)
from ModelConfig alone — no tracing — so bench.py / tools/bench_config.py can
report model FLOPs utilization (MFU) next to images/sec and a reader can tell
whether a config is compute-bound or leaving the MXU idle.

Conventions (the standard MFU bookkeeping):
  * a matmul/conv MAC counts 2 FLOPs; a complex MAC counts 8;
  * backward multipliers: x3 for a layer with trainable weights AND a
    differentiable input (dgrad + wgrad each cost one forward), x2 when the
    input is data (wgrad only — the lift conv: its im2col lhs is
    stop_gradient'ed in models/encoders.py), x2 for a linear op with no
    weights (the CTF DFT: dgrad only);
  * elementwise/VPU work (activations, the posterior softmax/KL, Fourier
    cosines, the likelihood) is NOT counted — it is bandwidth/transcendental
    bound, not MXU work, and including it would inflate MFU. The decoder's
    Fourier stage counts only its F x H matmul, not the cos.

Hot call sites being accounted, in reference terms: the lifting conv
(src/models.py:215-216), 1x1x1 mixing + heads (:347-351), the coordinate-MLP
decoder (:95-123), and the per-particle CTF application
(train_particles.py:298-307).

Peak: TPU v5e bf16 matmul peak is 197 TFLOP/s (public spec). MFU here is
model FLOPs / (step_time * peak_bf16) — the honest denominator for a step
whose matmuls all run in bf16; f32 fallback steps will show >100%-impossible
MFU only if misused, so mfu() takes the peak explicitly.
"""

from __future__ import annotations

from typing import Optional

from .config import ModelConfig

V5E_BF16_PEAK = 197e12


def encoder_flops(cfg: ModelConfig, batch: int) -> dict:
    """Forward+backward matmul FLOPs of the inference network."""
    e = cfg.encoder
    zd = e.z_dim
    d_heads = 3 + 2 * zd
    if e.mode == "A":
        n = e.image_dim * e.image_dim * e.in_channels
        h = e.kernels_num
        latent = zd + 3
        fwd = 2 * batch * (n * h + (e.num_layers - 1) * h * h
                           + h * 2 * latent)
        # first layer input is data: wgrad only (x2); rest x3
        first = 2 * batch * n * h
        return {"encoder_mlp": first * 2 + (fwd - first) * 3}

    from ..models.encoders import attn_dim_for
    hp = attn_dim_for(e)
    pos = batch * hp * hp
    R = e.groupconv if e.mode == "C" else max(e.groupconv, 1)
    K = e.kernels_num
    k = e.kernels_size if e.mode == "C" else e.image_dim
    # lift conv: every output position contracts C*k^2 taps into R*K channels
    lift_fwd = 2 * pos * e.in_channels * k * k * R * K
    out = {"lift_conv": lift_fwd * 2}          # input is data: fwd + wgrad
    if e.mode == "C":
        # mixing is per-rotation K x K; heads are per-rotation K x D
        out["mixing"] = 2 * pos * R * K * K * 3
        out["heads"] = 2 * pos * R * K * d_heads * 3
    else:
        # mode B: fc_r collapse folded into mixing ((R*K) x K contraction,
        # R=1 when groupconv==0), heads once per position
        out["mixing"] = 2 * pos * R * K * K * 3
        out["heads"] = 2 * pos * K * d_heads * 3
    return out


def decoder_flops(cfg: ModelConfig, batch: int) -> dict:
    """Forward+backward matmul FLOPs of the coordinate-MLP generator."""
    g = cfg.generator
    n = cfg.encoder.image_dim
    px = batch * n * n
    h = g.hidden_dim
    in_dim = g.embedding_dim if g.fourier_expansion else 2
    fwd = 2 * px * (in_dim * h                       # coord_linear
                    + (g.num_layers - 1) * h * h     # hidden stack
                    + h * g.n_out)                   # output head
    # + latent_linear, per image not per pixel
    fwd += 2 * batch * g.z_dim * h
    # x3: dgrad is needed even at the first layer (pose gradients flow
    # through the coordinates / Fourier features back to theta and dx)
    return {"decoder_mlp": fwd * 3}


def ctf_flops(cfg: ModelConfig, batch: int, ctf_dim: int) -> dict:
    """Per-particle CTF application FLOPs.

    The bf16 route runs the exact zero-padded circular convolution as dense
    complex DFT matmuls (losses/likelihoods.ctf_apply_dft): three
    S^2 @ S^2 sandwich products per image (forward y, forward kernel,
    inverse), each 2*S^3 complex MACs. Backward differentiates only the
    y-path (2 of the 3 sandwiches), a linear op: dgrad only.
    """
    n = cfg.encoder.image_dim
    S = n + ctf_dim - 1
    sandwich = 2 * S ** 3 * 8                       # complex MACs -> FLOPs
    fwd = 3 * sandwich * batch
    bwd = 2 * sandwich * batch
    total = fwd + bwd
    if cfg.likelihood.fit_noise:
        total *= 2                                  # variance conv too
    return {"ctf_dft": total}


def step_flops(cfg: ModelConfig, batch: int,
               ctf_dim: Optional[int] = None) -> dict:
    """Matmul FLOPs of one full training step (fwd + bwd + Adam).

    ctf_dim: per-particle CTF kernel size when the gaussian likelihood
    applies CTF correction (reference train_particles.py:298-307), else None.

    Returns {"total": float, "breakdown": {component: flops}}.
    """
    parts: dict = {}
    parts.update(encoder_flops(cfg, batch))
    parts.update(decoder_flops(cfg, batch))
    if ctf_dim:
        parts.update(ctf_flops(cfg, batch, ctf_dim))
    return {"total": float(sum(parts.values())),
            "breakdown": {k: float(v) for k, v in parts.items()}}


def mfu(total_flops: float, step_seconds: float,
        peak: float = V5E_BF16_PEAK) -> float:
    """Model FLOPs utilization: achieved / peak."""
    return total_flops / (step_seconds * peak)
