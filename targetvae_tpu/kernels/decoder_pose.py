"""Pose-aware fused decoder kernel: separable Fourier phase.

The decoder's coordinates are always an affine transform of the REGULAR pixel
grid: x = (x0 - dx) @ R(theta), x0[i,j] = (gx[j], gy[i]). The Fourier phase
is therefore separable:

    phase[i,j,f] = gx[j] * w''[0,f] + gy[i] * w''[1,f] + c[f]
    with w'' = R(theta) @ (Wf / sigma)  (per image),  c = -dx @ w'' + bf

so   cos(phase) = U[j] * P[i] - V[j] * Q[i]
with U = cos(gx w''_0), V = sin(gx w''_0), P = cos(gy w''_1 + c),
Q = sin(gy w''_1 + c): 4 * (n, F) transcendentals per image instead of
n^2 * F. Direct evaluation of the n^2*F cos is the measured bottleneck of the
whole training step on TPU (~7.8 ms per 256M elements at batch 100); the
separable form removes 98% of the transcendentals and the kernel rebuilds the
(pixels, F) feature tile in VMEM with two multiply-adds per element.

U,V,P,Q are computed in XLA outside the kernel (20M elements, cheap). The
pose gradients are fused into the backward kernel: instead of emitting the
four (B, rows, F) table cotangents dU,dV,dP,dQ to HBM (and recombining them
in an XLA pass), the kernel reduces them on-chip to the three (B, F)
frequency cotangents

    dw0[f] = sum_j gx[j] * (dV*U - dU*V)[j,f]      (d phase_x / d w''_0)
    dw1[f] = sum_i gy[i] * (dQ*P - dP*Q)[i,f]      (d phase_y / d w''_1)
    dc[f]  = sum_i        (dQ*P - dP*Q)[i,f]

(using cos' = -sin, sin' = cos, so d(ax) = dV*U - dU*V elementwise), and the
wrapper closes the chain per image with O(B*F) work:
    ddx = (-sum_f dc*w''_0, -sum_f dc*w''_1)
    dtheta = sum_f (dw0_tot * w''_1 - dw1_tot * w''_0),
    dwk_tot = dwk + dc * (-dx_k)   (cvec = bf - dx @ w'')
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_mlp import _act, _dact, _dact_from_h


def pose_freqs(theta, dx, wf_over_sigma, bf):
    """Per-image rotated frequency vectors (B, F): w'' = R(theta) @ (Wf/sigma)
    and the phase constant cvec = bf - dx @ w''.

    wf_over_sigma: (2, F) = Wf / sigma (stop-gradient buffers applied by the
    caller); theta (B,), dx (B, 2).
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    # x_t = (x0 - dx) @ R with R = [[c, s], [-s, c]] (ops/coords.py):
    # phase = x_t @ wf = (x0 - dx) @ (R @ wf)
    w0 = c[:, None] * wf_over_sigma[0] + s[:, None] * wf_over_sigma[1]   # (B,F)
    w1 = -s[:, None] * wf_over_sigma[0] + c[:, None] * wf_over_sigma[1]  # (B,F)
    cvec = bf[None] - (dx[:, 0:1] * w0 + dx[:, 1:2] * w1)                # (B,F)
    return w0, w1, cvec


def pose_tables(theta, dx, wf_over_sigma, bf, image_dim: int, rows_padded: int):
    """Build U,V,P,Q (B, rows_padded, F) f32 in XLA."""
    n = image_dim
    w0, w1, cvec = pose_freqs(theta, dx, wf_over_sigma, bf)
    gx = jnp.linspace(-1.0, 1.0, n)
    gy = jnp.linspace(1.0, -1.0, n)
    pad = rows_padded - n
    if pad:
        gx = jnp.concatenate([gx, jnp.zeros(pad)])
        gy = jnp.concatenate([gy, jnp.zeros(pad)])
    ax = gx[None, :, None] * w0[:, None, :]             # (B, rows, F)
    ay = gy[None, :, None] * w1[:, None, :] + cvec[:, None, :]
    return jnp.cos(ax), jnp.sin(ax), jnp.cos(ay), jnp.sin(ay)


def _features(u, v, p, q, tr, n, F):
    """f[i*n + j, :] = U[j]*P[i] - V[j]*Q[i]; u,v: (n, F); p,q: (tr, F)."""
    f3 = (u[None, :, :] * p[:, None, :] - v[None, :, :] * q[:, None, :])
    return f3.reshape(tr * n, F)


def _fwd_kernel(u_ref, v_ref, p_ref, q_ref, hz_ref, w1_ref, b1_ref, wh_ref,
                bh_ref, w3_ref, b3_ref, y_ref, *hs_refs, n: int, tr: int,
                L: int, act_kind: str, save_res: bool):
    b_idx = pl.program_id(0)
    F = u_ref.shape[-1]
    u = u_ref[0, :n, :]
    v = v_ref[0, :n, :]
    p = p_ref[0, 0]
    q = q_ref[0, 0]
    if _DEBUG_FBUILD == "ablate":
        # timing apparatus ONLY (wrong math): replace the feature build with
        # a near-free iota so (kernel_old - kernel_ablate) measures the
        # build's true in-situ cost for the FLOP-floor argument
        f16 = (jax.lax.broadcasted_iota(jnp.int32, (tr * n, F), 1)
               .astype(jnp.bfloat16) * (1.0 / F))
    else:
        f16 = _features(u, v, p, q, tr, n, F).astype(jnp.bfloat16)
    pre1 = (jnp.dot(f16, w1_ref[...], preferred_element_type=jnp.float32)
            + b1_ref[...] + hz_ref[pl.ds(b_idx % 8, 1), :])
    h = _act(pre1, act_kind).astype(jnp.bfloat16)
    if save_res:
        hs_refs[0][0, 0] = h
    for l in range(L):   # static depth: hidden layers beyond coord_linear
        pre = jnp.dot(h, wh_ref[l],
                      preferred_element_type=jnp.float32) + bh_ref[l]
        h = _act(pre, act_kind).astype(jnp.bfloat16)
        if save_res:
            hs_refs[l + 1][0, 0] = h
    if len(y_ref.shape) == 3:
        # small n_out rides a lane-major (B, n_out*nt, tr*n) output: a
        # trailing n_out dim would be tiled (8, 128) -> 128/n_out x lane
        # padding (155 MB physical for 48 MB of pixels at EMPIAR scale for
        # n_out=1, ~43x for galaxy's RGB 3, +repack). The block covers all
        # n_out*nt rows (pallas wants last-two block dims (8,128)-divisible
        # or full) and stays VMEM-resident per image. The rows are produced
        # DIRECTLY as (n_out, px) by contracting w3 against h's H axis — a
        # (px, n_out) dot output would need a sublane<->lane relayout (69
        # near-empty (8,128) tiles at px=550, ~1 ms/step). b3 arrives
        # (n_out, 1) here (broadcast over px). Channels live in SEPARATE
        # row PLANES (row c*nt + t): Mosaic proves single-row stores at any
        # dynamic sublane offset, but rejects multi-row stores at t*n_out
        # ("index in dimension 1 is a multiple of 4" — measured on v5e).
        C = w3_ref.shape[1]
        y_rows = jax.lax.dot_general(
            w3_ref[...], h, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (n_out, px)
        yb = y_rows + b3_ref[...]
        t_idx = pl.program_id(1)
        nt = pl.num_programs(1)
        for c in range(C):
            y_ref[0, pl.ds(c * nt + t_idx, 1)] = yb[c:c + 1]
    else:
        y = jnp.dot(h, w3_ref[...], preferred_element_type=jnp.float32)
        y_ref[0, 0] = y + b3_ref[...]


def _bwd_kernel(u_ref, v_ref, p_ref, q_ref, hz_ref, w1_ref, b1_ref, wh_ref,
                bh_ref, w3_ref, g_ref, *rest_refs, n: int, tr: int,
                hp_rows: int, L: int, act_kind: str, lane_major: bool):
    hs_refs = rest_refs[:L + 1]      # bf16 activations saved by the forward
    rest_refs = rest_refs[L + 1:]
    if lane_major:                   # small n_out (see _specs): +identity
        eye_ref, rest_refs = rest_refs[0], rest_refs[1:]
    (dfx_ref, dfy_ref, dfc_ref, dhz_ref, dw1_ref, db1_ref,
     dwh_ref, dbh_ref, dw3_ref, db3_ref) = rest_refs
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    F = u_ref.shape[-1]
    H = wh_ref.shape[1]

    u = u_ref[0, :n, :]
    v = v_ref[0, :n, :]
    # zero padded image rows (i >= image_dim) so accumulators stay clean
    rows = jax.lax.broadcasted_iota(jnp.int32, (tr, 1), 0) + t_idx * tr
    row_ok = (rows < hp_rows).astype(jnp.float32)
    p = p_ref[0, 0] * row_ok
    q = q_ref[0, 0] * row_ok

    hs16 = [hs_refs[i][0, 0] for i in range(L + 1)]

    pix_ok = jnp.repeat(row_ok, n, axis=0)              # (tr*n, 1)
    if lane_major:
        # (n_out, px) -> (px, n_out) via an MXU identity contraction: a
        # reshape/transpose here is a sublane<->lane relayout (69 near-empty
        # (8,128) tiles at px=550, ~1 ms/step of VPU shuffles); the matmul
        # is n_out * 0.3 MFLOP. Channel planes (row c*nt + t) mirror the
        # forward's store layout — single-row dynamic-offset reads only.
        # For C == 1 the identity is bf16 (every matmul consumer uses g in
        # bf16, and cast commutes with a 0/1 contraction) so its VMEM cost
        # — the quadratic term that bounds the row tile — is halved; the
        # f32 db3 sum comes straight off the lane-major rows. C > 1 keeps
        # the f32 identity: Mosaic lowers the (px, px) x (C, px)
        # contraction to tpu.matmul, whose verifier requires a 32-bit
        # accumulator (bf16 pref fails 'Expected matmul acc to be 32-bit'
        # on v5e; the C == 1 form avoids tpu.matmul entirely — an f32 pref
        # there emits a bf16->f32 vector.broadcast of the eye that fails
        # the verifier the other way).
        C = w3_ref.shape[1]
        nt = pl.num_programs(1)
        g_rows = jnp.concatenate(
            [g_ref[0, pl.ds(c * nt + t_idx, 1)] for c in range(C)],
            axis=0) if C > 1 else g_ref[0, pl.ds(t_idx, 1)]  # (n_out, px)
        # mask padded image rows in lane space: lane l = pixel row l // n
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, tr * n), 1)
        lane_ok = (lane_i // n + t_idx * tr < hp_rows).astype(jnp.float32)
        g_rows = g_rows * lane_ok
        db3 = jax.lax.dot_general(                      # (1, n_out) f32
            jnp.ones((1, tr * n), jnp.float32), g_rows,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if C == 1:
            g16 = jax.lax.dot_general(
                eye_ref[...], g_rows.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.bfloat16)
        else:
            g16 = jax.lax.dot_general(
                eye_ref[...], g_rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    else:
        g = g_ref[0, 0] * pix_ok                        # (tr*n, n_out)
        db3 = jnp.sum(g, axis=0, keepdims=True)
        g16 = g.astype(jnp.bfloat16)

    dw3 = jax.lax.dot_general(hs16[-1], g16, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(g16, w3_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dwh_l = [None] * L
    dbh_l = [None] * L
    for l in range(L - 1, -1, -1):
        dpre = dh * _dact_from_h(hs16[l + 1], act_kind)
        dpre_16 = dpre.astype(jnp.bfloat16)
        dwh_l[l] = jax.lax.dot_general(hs16[l], dpre_16,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        dbh_l[l] = jnp.sum(dpre, axis=0, keepdims=True)
        dh = jax.lax.dot_general(dpre_16, wh_ref[l], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dpre1 = dh * _dact_from_h(hs16[0], act_kind)
    dpre1 = dpre1 * pix_ok
    dpre1_16 = dpre1.astype(jnp.bfloat16)
    db1 = jnp.sum(dpre1, axis=0, keepdims=True)

    # fused pose-frequency cotangents via the sine-addition identity:
    # f = U[j]P[i] - V[j]Q[i] = cos(ax_j + ay_i), and the phase cotangent
    # per pixel is d(phase) = -df3 * sin(ax_j + ay_i) with
    # sin(ax+ay) = V[j]P[i] + U[j]Q[i]. Then
    #   dfc[f] = sum_px d(phase);  dfx[f] = sum_px gx[j] d(phase);
    #   dfy[f] = sum_px gy[i] d(phase)
    # — ONE elementwise product T = df3 * s plus a single (px, 3)-weighted
    # MXU contraction, replacing the four cross-axis VPU reductions
    # (dp/dq/du/dv) of the direct form, which dominated the bwd at big
    # image dims (~7 ms of VPU work at EMPIAR scale). The reduction stays
    # f32 end to end (its FLOPs are negligible). Padded rows have p=q=0,
    # so s and T vanish there automatically.
    # Mosaic iota is integer-only; build int32 then cast.
    px_i = jax.lax.broadcasted_iota(jnp.int32, (tr * n, 1), 0)
    jx = (px_i % n).astype(jnp.float32)
    iy = (px_i // n + tr * t_idx).astype(jnp.float32)
    ones = jnp.ones((tr * n, 1), jnp.float32)
    gxv = -1.0 + (2.0 / (n - 1)) * jx
    gyv = 1.0 - (2.0 / (hp_rows - 1)) * iy
    wred = jnp.concatenate([ones, gxv, gyv], axis=1)    # (px, 3)
    # 4 chunks measured best at F=1024 (back-to-back sweep, BENCH_NOTES
    # round-4 entry: nc=2 10.98-11.15 ms fwd+bwd, nc=1 10.91, nc=4 10.80)
    n_chunks = _DEBUG_NCHUNKS or (4 if F % 512 == 0 else
                                  (2 if F % 256 == 0 else 1))
    Fc = F // n_chunks
    dw1_parts, red_parts = [], []
    for c in range(n_chunks):
        sl = slice(c * Fc, (c + 1) * Fc)
        uc, vc, pc, qc = u[:, sl], v[:, sl], p[:, sl], q[:, sl]
        if _DEBUG_FBUILD == "ablate":     # timing apparatus, wrong math
            f16 = (jax.lax.broadcasted_iota(jnp.int32, (tr * n, Fc), 1)
                   .astype(jnp.bfloat16) * (1.0 / Fc))
            s = (jax.lax.broadcasted_iota(jnp.int32, (tr * n, Fc), 0)
                 .astype(jnp.float32) * (1.0 / (tr * n)))
        else:
            f16 = _features(uc, vc, pc, qc, tr, n, Fc).astype(jnp.bfloat16)
            s = (vc[None, :, :] * pc[:, None, :]
                 + uc[None, :, :] * qc[:, None, :]).reshape(tr * n, Fc)
        dw1_parts.append(jax.lax.dot_general(
            f16, dpre1_16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))        # (Fc, H)
        df3 = jax.lax.dot_general(
            dpre1_16, w1_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # (px, Fc)
        T = df3 * s                                     # (px, Fc) f32
        red_parts.append(jax.lax.dot_general(
            wred, T, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))        # (3, Fc)
    dw1 = jnp.concatenate(dw1_parts, axis=0)            # (F, H)
    red = -jnp.concatenate(red_parts, axis=-1)          # (3, F)
    dfc = red[0:1, :]
    dfx = red[1:2, :]
    dfy = red[2:3, :]

    # freq outputs are (8, F) blocks indexed b//8 (Mosaic needs the
    # second-minor block dim divisible by 8): zero the block on entry, then
    # accumulate this image's row
    row = b_idx % 8

    @pl.when(jnp.logical_and(row == 0, t_idx == 0))
    def _init_freq():
        zeros = jnp.zeros(dfx_ref.shape, dfx_ref.dtype)
        dfx_ref[...] = zeros
        dfy_ref[...] = zeros
        dfc_ref[...] = zeros

    dfx_ref[pl.ds(row, 1), :] += dfx
    dfy_ref[pl.ds(row, 1), :] += dfy
    dfc_ref[pl.ds(row, 1), :] += dfc

    first = jnp.logical_and(b_idx == 0, t_idx == 0)

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        for l in range(L):
            dwh_ref[l] = dwh_l[l]
            dbh_ref[l] = dbh_l[l]
        dw3_ref[...] = dw3
        db3_ref[...] = db3

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        for l in range(L):
            dwh_ref[l] += dwh_l[l]
            dbh_ref[l] += dbh_l[l]
        dw3_ref[...] += dw3
        db3_ref[...] += db3

    # dhz rides an (8, H) block indexed b//8 (batch-size-independent vmem):
    # zero on block entry, accumulate this image's row
    @pl.when(jnp.logical_and(b_idx % 8 == 0, t_idx == 0))
    def _init_dhz():
        dhz_ref[...] = jnp.zeros(dhz_ref.shape, dhz_ref.dtype)

    dhz_ref[pl.ds(b_idx % 8, 1), :] += db1


def _specs(B, nt, tr, n, F, H, L, n_out, rows_padded):
    uv = pl.BlockSpec((1, rows_padded, F), lambda b, t: (b, 0, 0))
    pq = pl.BlockSpec((1, 1, tr, F), lambda b, t: (b, t, 0, 0))
    return {
        "u": uv, "v": uv, "p": pq, "q": pq,
        # hz/dhz ride (8, H) blocks indexed b//8 so the kernel's scoped vmem
        # is batch-size independent (full (B,H) blocks OOM'd tr=10 at B=256)
        "hz": pl.BlockSpec((8, H), lambda b, t: (b // 8, 0)),
        "w1": pl.BlockSpec((F, H), lambda b, t: (0, 0)),
        "b1": pl.BlockSpec((1, H), lambda b, t: (0, 0)),
        "wh": pl.BlockSpec((L, H, H), lambda b, t: (0, 0, 0)),
        "bh": pl.BlockSpec((L, 1, H), lambda b, t: (0, 0, 0)),
        "w3": pl.BlockSpec((H, n_out), lambda b, t: (0, 0)),
        "b3": pl.BlockSpec((1, n_out), lambda b, t: (0, 0)),
        # lane-major fwd bias: (n_out, 1), broadcast over px in-kernel
        "b3_in": (pl.BlockSpec((n_out, 1), lambda b, t: (0, 0))
                  if _lane_major(n_out) else
                  pl.BlockSpec((1, n_out), lambda b, t: (0, 0))),
        # small n_out drops the trailing channel dim (see _fwd_kernel): a
        # (…, tr*n, n_out) block would pad n_out lanes to 128 in the HBM
        # tiling; channels ride the row axis as nt-row planes (row c*nt + t)
        "y": (pl.BlockSpec((1, nt * n_out, tr * n), lambda b, t: (b, 0, 0))
              if _lane_major(n_out) else
              pl.BlockSpec((1, 1, tr * n, n_out), lambda b, t: (b, t, 0, 0))),
    }


def _lane_major(n_out: int) -> bool:
    """Channels ride the row axis for any n_out small enough that lane
    padding would dominate (covers 1 grayscale / 2 fit-noise / 3 RGB)."""
    return n_out <= 8


def _stack_hidden(w2, b2):
    """(L, H, H) bf16 weights + (L, 1, H) f32 biases from the hidden list."""
    wh = jnp.stack([w.astype(jnp.bfloat16) for w in w2])
    bh = jnp.stack([b.reshape(1, -1) for b in b2])
    return wh, bh


def _fwd(u, v, p4, q4, hz, w1, b1, w2, b2, w3, b3, *, n, tr, act_kind,
         interpret, save_res=False):
    B, rows_padded, F = u.shape
    nt = p4.shape[1]
    H = w1.shape[1]
    L = len(w2)
    n_out = w3.shape[1]
    sp = _specs(B, nt, tr, n, F, H, L, n_out, rows_padded)
    wh, bh = _stack_hidden(w2, b2)
    h_spec = pl.BlockSpec((1, 1, tr * n, H), lambda b, t: (b, t, 0, 0))
    h_shape = jax.ShapeDtypeStruct((B, nt, tr * n, H), jnp.bfloat16)
    lane_major = _lane_major(n_out)
    y_shape = (jax.ShapeDtypeStruct((B, nt * n_out, tr * n), jnp.float32)
               if lane_major else
               jax.ShapeDtypeStruct((B, nt, tr * n, n_out), jnp.float32))
    out_specs = sp["y"] if not save_res else (
        (sp["y"],) + (h_spec,) * (L + 1))
    out_shape = (y_shape if not save_res else
                 (y_shape,) + (h_shape,) * (L + 1))
    b3_arg = (b3.reshape(n_out, 1) if lane_major else b3.reshape(1, n_out))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n=n, tr=tr, L=L, act_kind=act_kind,
                          save_res=save_res),
        grid=(B, nt),
        in_specs=[sp["u"], sp["v"], sp["p"], sp["q"], sp["hz"], sp["w1"],
                  sp["b1"], sp["wh"], sp["bh"], sp["w3"], sp["b3_in"]],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # lane-major: the y block is revisited across t (rows written
            # n_out at a time into the per-image resident block)
            dimension_semantics=("parallel",
                                 "arbitrary" if lane_major else "parallel")),
        interpret=interpret,
    )(u, v, p4, q4, hz, w1.astype(jnp.bfloat16), b1.reshape(1, H),
      wh, bh, w3.astype(jnp.bfloat16), b3_arg)


def _bwd(res, g, *, n, tr, act_kind, interpret):
    u, v, p4, q4, hz, w1, b1, w2, b2, w3, b3, hs = res
    B, rows_padded, F = u.shape
    nt = p4.shape[1]
    H = w1.shape[1]
    L = len(w2)
    n_out = w3.shape[1]
    sp = _specs(B, nt, tr, n, F, H, L, n_out, rows_padded)
    wh, bh = _stack_hidden(w2, b2)
    h_spec = pl.BlockSpec((1, 1, tr * n, H), lambda b, t: (b, t, 0, 0))
    freq_spec = pl.BlockSpec((8, F), lambda b, t: (b // 8, 0))

    out_shapes = (
        jax.ShapeDtypeStruct((B, F), jnp.float32),                # dw0
        jax.ShapeDtypeStruct((B, F), jnp.float32),                # dw1 (freq)
        jax.ShapeDtypeStruct((B, F), jnp.float32),                # dc
        jax.ShapeDtypeStruct((B, H), jnp.float32),                # dhz
        jax.ShapeDtypeStruct((F, H), jnp.float32),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((L, H, H), jnp.float32),
        jax.ShapeDtypeStruct((L, 1, H), jnp.float32),
        jax.ShapeDtypeStruct((H, n_out), jnp.float32),
        jax.ShapeDtypeStruct((1, n_out), jnp.float32),
    )
    lane_major = _lane_major(n_out)
    eye_in, eye_args = [], []
    if lane_major:
        px = tr * n
        eye_in = [pl.BlockSpec((px, px), lambda b, t: (0, 0))]
        eye_dt = jnp.bfloat16 if n_out == 1 else jnp.float32
        eye_args = [jnp.eye(px, dtype=eye_dt)]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n=n, tr=tr, hp_rows=n, L=L,
                          act_kind=act_kind, lane_major=lane_major),
        grid=(B, nt),
        in_specs=[sp["u"], sp["v"], sp["p"], sp["q"], sp["hz"], sp["w1"],
                  sp["b1"], sp["wh"], sp["bh"], sp["w3"], sp["y"]]
                 + [h_spec] * (L + 1) + eye_in,
        out_specs=(freq_spec, freq_spec, freq_spec,
                   pl.BlockSpec((8, H), lambda b, t: (b // 8, 0)),
                   sp["w1"], sp["b1"], sp["wh"], sp["bh"], sp["w3"],
                   sp["b3"]),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(u, v, p4, q4, hz, w1.astype(jnp.bfloat16), b1.reshape(1, H),
      wh, bh, w3.astype(jnp.bfloat16), g, *hs, *eye_args)

    dfx, dfy, dfc, dhz, dw1, db1, dwh, dbh, dw3, db3 = outs
    dw2 = tuple(dwh[l] for l in range(L))
    db2 = tuple(dbh[l, 0] for l in range(L))
    return (dfx, dfy, dfc, dhz, dw1, db1.reshape(H), dw2, db2,
            dw3, db3.reshape(n_out))


def _build_tables(theta, dx, wf, bf, n, tr):
    nt = -(-n // tr)
    rows_padded = nt * tr
    u, v, p, q = pose_tables(theta, dx, wf, bf, n, rows_padded)
    B, F = theta.shape[0], wf.shape[1]
    return u, v, p.reshape(B, nt, tr, F), q.reshape(B, nt, tr, F)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused(n, tr, act_kind, interpret, theta, dx, wf, bf, hz, w1, b1, w2, b2,
           w3, b3):
    u, v, p4, q4 = _build_tables(theta, dx, wf, bf, n, tr)
    return _fwd(u, v, p4, q4, hz, w1, b1, w2, b2, w3, b3, n=n, tr=tr,
                act_kind=act_kind, interpret=interpret)


def _vjp_fwd(n, tr, act_kind, interpret, theta, dx, wf, bf, hz, w1, b1, w2,
             b2, w3, b3):
    u, v, p4, q4 = _build_tables(theta, dx, wf, bf, n, tr)
    y, *hs = _fwd(u, v, p4, q4, hz, w1, b1, w2, b2, w3, b3, n=n, tr=tr,
                  act_kind=act_kind, interpret=interpret, save_res=True)
    return y, (theta, dx, wf, bf, u, v, p4, q4, hz, w1, b1, w2, b2, w3, b3,
               tuple(hs))


def _vjp_bwd(n, tr, act_kind, interpret, res, g):
    theta, dx, wf, bf, u, v, p4, q4, hz, w1, b1, w2, b2, w3, b3, hs = res
    (dfx, dfy, dfc, dhz, dw1, db1, dw2, db2, dw3, db3) = _bwd(
        (u, v, p4, q4, hz, w1, b1, w2, b2, w3, b3, hs), g, n=n, tr=tr,
        act_kind=act_kind, interpret=interpret)
    # close the pose chain per image (module docstring): O(B*F) in XLA
    a0, a1, _ = pose_freqs(theta, dx, wf, bf)           # (B, F) each
    ddx = -jnp.stack([jnp.sum(dfc * a0, axis=1),
                      jnp.sum(dfc * a1, axis=1)], axis=1)
    a0_tot = dfx - dfc * dx[:, 0:1]                     # + dc * d(cvec)/d(w0)
    a1_tot = dfy - dfc * dx[:, 1:2]
    dtheta = jnp.sum(a0_tot * a1 - a1_tot * a0, axis=1)
    return (dtheta, ddx, jnp.zeros_like(wf), jnp.zeros_like(bf), dhz,
            dw1, db1, dw2, db2, dw3, db3)


_fused.defvjp(_vjp_fwd, _vjp_bwd)

# Tile-row / F-chunk debug overrides, read ONCE at import: the jit cache does
# not key on env vars, so a post-compile change would silently not apply for
# cached shapes. Set TARGETVAE_DECODER_TR / TARGETVAE_DEC_NCHUNKS before the
# process's first compile (bench sweeps only; 0 = tuned defaults).
_DEBUG_TR = int(os.environ.get("TARGETVAE_DECODER_TR", "0"))
_DEBUG_NCHUNKS = int(os.environ.get("TARGETVAE_DEC_NCHUNKS", "0"))
# NEGATIVE RESULT (2026-08-21, tools/bench_decoder.py mnist, fwd / fwd+bwd
# ms): two re-formulations of the feature build both LOSE to the f32
# (tr, n, F) broadcast + collapse + cast this kernel ships ("old" 4.12 /
# 11.15): bf16 3-D builds measured 4.23 / 11.81 and per-image-row bf16 2-D
# builds with per-row matmuls 5.15 / 12.83 — the broadcast/collapse is NOT
# the kernel's bottleneck, bf16 VPU ops don't run faster here, and M=50
# per-row matmuls cost more in launch overhead than any build saving (both
# variants deleted; BENCH_NOTES.md). The one value this knob keeps is the
# floor-measurement apparatus: "ablate" swaps the f/s builds for near-free
# iotas (WRONG MATH) so kernel_default - kernel_ablate pins the build's
# in-situ cost.
_DEBUG_FBUILD = os.environ.get("TARGETVAE_DEC_FBUILD", "")
if _DEBUG_FBUILD:
    # "ablate" deliberately computes WRONG features (floor-measurement
    # apparatus) — a training run with this env var leaked would silently
    # learn garbage, so shout at import (ADVICE r4)
    import warnings

    warnings.warn(
        f"TARGETVAE_DEC_FBUILD={_DEBUG_FBUILD!r} is set: the pose decoder's "
        "feature build is replaced by BENCH-ONLY (mathematically wrong) "
        "ablation code. Never train with this.", stacklevel=2)


def pose_decoder_supported(cfg) -> bool:
    """The pose kernel covers any depth (static hidden-layer loop); it needs
    the Fourier expansion (for the separable phase) and no resid skips."""
    return (cfg.fourier_expansion and cfg.num_layers >= 2 and not cfg.resid
            and cfg.z_dim > 0)


def _auto_tile_rows(n: int, F: int, H: int, L: int = 1, B: int = 0) -> int:
    """Row tile for the fused decoder, tuned on v5e (BENCH_NOTES.md sweep).

    Mosaic's scoped-vmem ceiling AND throughput for this kernel depend on the
    enclosing program, not just the standalone kernel (tr=10 at n=50 compiled
    alone yet overflowed scoped vmem inside the jitted step before the bwd's
    F-chunking). With the F-chunked backward, <=550-px tiles compile and win
    in-step at every headline shape (n=50 tr=10 4442 img/s, n=110 tr=5
    78.7 ms vs 81.4 at tr=2); 880-px tiles still cost the particles step
    +4.6 ms. Deep generators carry (L+1) hidden-residual tiles + stacked
    (L,H,H) weight/grad blocks, which pushes 512-px tiles over the ceiling
    at L=3 (galaxy: +1.22M) — they stay at <=320 px; so do batches beyond
    the validated 100 (the headline tile rides ~100K under the 16M scoped
    limit — B=256 at 500 px tipped over before hz/dhz moved to (8,H)
    blocks, and margin beats the last 1-2%). Divisors of n only — padded
    rows are pure waste (dsprites tr=10 pads 64->70 rows and loses 10%
    over tr=8)."""
    big = 550 if (L <= 1 and (B == 0 or B <= 100)) else 320
    cap_px = max(n, (big * 1024) // F)
    best = 1
    for tr in range(1, min(n, 16) + 1):
        if tr * n <= cap_px and n % tr == 0:
            best = tr
    return best


def fused_pose_decoder(theta, dx, z, params, cfg, image_dim: int,
                       tr: int = 0, interpret: bool = False):
    """Full pose-aware decoder: (theta (B,), dx (B,2), z (B,zd)) ->
    (B, image_dim^2, n_out). Equivalent to
    generator_apply(params, cfg, transform_coords(grid, dx, theta), z)."""
    n = image_dim
    if tr <= 0:
        tr = _DEBUG_TR  # import-time debug knob (see definition)
    if tr <= 0:
        F_ = params["fourier"]["w"].shape[1]
        H_ = params["coord_linear"]["w"].shape[1]
        tr = _auto_tile_rows(n, F_, H_, len(params["hidden"]),
                             theta.shape[0])
    nt = -(-n // tr)
    rows_padded = nt * tr

    fw = jax.lax.stop_gradient(params["fourier"]["w"])
    fb = jax.lax.stop_gradient(params["fourier"]["b"])
    wf = fw / jnp.asarray(cfg.fourier_sigma, fw.dtype)
    B = theta.shape[0]

    hz = jnp.dot(z, params["latent_linear"]["w"],
                 preferred_element_type=jnp.float32)
    y = _fused(n, tr, cfg.activation, interpret, theta, dx, wf, fb, hz,
               params["coord_linear"]["w"], params["coord_linear"]["b"],
               tuple(h["w"] for h in params["hidden"]),
               tuple(h["b"] for h in params["hidden"]),
               params["out"]["w"], params["out"]["b"])
    if y.ndim == 3:                 # lane-major layout (_specs): rows carry
        C = y.shape[1] // nt        # the n_out channels as nt-row planes
        if C == 1:
            return y.reshape(B, rows_padded * n)[:, :n * n, None]
        y = y.reshape(B, C, rows_padded * n)
        return jnp.transpose(y, (0, 2, 1))[:, :n * n, :]
    n_out = y.shape[-1]
    return y.reshape(B, rows_padded * n, n_out)[:, :n * n, :]
