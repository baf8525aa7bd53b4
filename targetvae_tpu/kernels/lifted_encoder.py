"""Fused lifted-group-conv + heads encoder kernel (mode C, any C_in).

STATUS (round 3): opt-in alternative tier (TARGETVAE_ENCODER_TIER=patch).
The 1-D-conv implicit-GEMM lift (models/encoders.py::_mode_c_xla_matmul)
measured 1.2 ms/step faster at the flagship shape — the only shape family
whose working set fits this kernel's VMEM budget — because build_patches'
238 MB im2col materialization costs ~2 ms of HBM relayout copies that the
implicit GEMM never pays (interleaved A/B, BENCH_NOTES.md round 3). Kept
parity-tested as the reference implementation of a fully fused
single-kernel encoder.

The TARGET-VAE encoder lifts the image with an image-sized rotated filter bank
(k = 28..65, R*K up to 2048 output channels), applies a 1x1x1 mixing conv and
three 1x1x1 heads (reference src/models.py:346-351). XLA's direct conv
lowering reaches ~42 TF/s and materializes the (B, H', W', R, K) lift tensor
(hundreds of MB) in HBM between every op.

Design (v2): the im2col patch matrix P (B, H'W', k^2) is built ONCE in XLA as
a bf16 HBM array — slice+concat at HBM bandwidth (~0.3 ms at batch 100) —
after profiling showed in-kernel patch assembly dominates everything else
(5.2 ms/pass of VPU shuffles vs ~1 ms for the 244-GFLOP lift matmul, which
runs at ~250 TF/s effective inside the kernel). The kernel is then a pure
fused matmul + mixing + heads over P tiles; the lift tensor never exists in
HBM, and the backward kernel reads the same P (patches are data — no image
gradient), so nothing is ever rebuilt.

The rotated filter matrix Wc is assembled outside (ops/rotate.py gather
tables), so its gradient chains to the canonical (out, in, rot_in, k, k)
weight through XLA autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_mlp import _act, _dact, _dact_from_h


def encoder_kernel_supported(cfg) -> bool:
    return cfg.mode == "C"


def build_patches(xp: jnp.ndarray, k: int, wp: int, hp: int, nt: int,
                  tile_rows: int) -> jnp.ndarray:
    """im2col in XLA: xp (B, n2, n2) or (B, n2, n2, C) -> bf16
    (B, nt, tile_rows*wp, C*k*k) with column order c*k*k + di*k + dj
    (channel-major, matching the Wc flatten) and zero rows beyond hp.
    """
    if xp.ndim == 3:
        xp = xp[..., None]
    B, C = xp.shape[0], xp.shape[-1]
    rows_padded = nt * tile_rows
    chans = []
    for c in range(C):
        x = xp[..., c]
        q = jnp.stack([x[:, :, dj:dj + wp] for dj in range(k)], axis=-1)
        q = q.astype(jnp.bfloat16)                   # (B, n2, wp, k)
        if q.shape[1] < rows_padded + k - 1:
            q = jnp.pad(q, ((0, 0), (0, rows_padded + k - 1 - q.shape[1]),
                            (0, 0), (0, 0)))
        chans.append(jnp.concatenate(
            [q[:, di:di + rows_padded] for di in range(k)],
            axis=-1))                                # (B, rows, wp, k*k)
    p = jnp.concatenate(chans, axis=-1) if C > 1 else chans[0]
    if rows_padded > hp:
        mask = (jnp.arange(rows_padded) < hp)[None, :, None, None]
        p = jnp.where(mask, p, jnp.bfloat16(0))
    return p.reshape(B, nt, tile_rows * wp, C * k * k)


def _fwd_kernel(p_ref, wc_ref, bc_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                out_ref, *hs_refs, R: int, K: int, D: int, act_kind: str,
                save_res: bool):
    p16 = p_ref[0, 0]                                # (Tr*Wp, k*k) bf16
    pre1 = jnp.dot(p16, wc_ref[...],
                   preferred_element_type=jnp.float32) + bc_ref[...]
    h1 = _act(pre1, act_kind)                        # (Tr*Wp, R*K)
    h1_16 = h1.astype(jnp.bfloat16)
    if save_res:
        hs_refs[0][0, 0] = h1_16  # bwd reads this instead of redoing the lift
    # mixing + heads per rotation (static loop keeps every op 2-D; Mosaic has
    # no multi-axis reshapes): out[:, r*D:(r+1)*D] = heads(mix(h1_r))
    outs = []
    for r in range(R):
        h1r = h1_16[:, r * K:(r + 1) * K]
        pre2 = jnp.dot(h1r, w2_ref[...],
                       preferred_element_type=jnp.float32) + b2_ref[...]
        h2 = _act(pre2, act_kind).astype(jnp.bfloat16)
        outs.append(jnp.dot(h2, wh_ref[...],
                            preferred_element_type=jnp.float32) + bh_ref[...])
    out_ref[0, 0] = jnp.concatenate(outs, axis=-1)   # (Tr*Wp, R*D)


def _bwd_kernel(p_ref, wc_ref, bc_ref, w2_ref, b2_ref, wh_ref, g_ref, h1_ref,
                dwc_ref, dbc_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref, *,
                R: int, K: int, D: int, act_kind: str):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    p16 = p_ref[0, 0]
    h1_16 = h1_ref[0, 0]     # bf16 residual saved by the forward: the lift
                             # matmul (the big FLOP) is never recomputed
    g2 = g_ref[0, 0]                                 # (Tr*Wp, R*D)
    w2_16 = w2_ref[...]
    wh16 = wh_ref[...]

    dwh = jnp.zeros((K, D), jnp.float32)
    dbh = jnp.zeros((1, D), jnp.float32)
    dw2 = jnp.zeros((K, K), jnp.float32)
    db2 = jnp.zeros((1, K), jnp.float32)
    dpre1_parts = []
    for r in range(R):
        h1r16 = h1_16[:, r * K:(r + 1) * K]
        pre2 = jnp.dot(h1r16, w2_16,
                       preferred_element_type=jnp.float32) + b2_ref[...]
        h2 = _act(pre2, act_kind)
        h2_16 = h2.astype(jnp.bfloat16)
        gr = g2[:, r * D:(r + 1) * D]
        gr16 = gr.astype(jnp.bfloat16)

        dwh += jax.lax.dot_general(h2_16, gr16, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dbh += jnp.sum(gr, axis=0, keepdims=True)
        dh2 = jax.lax.dot_general(gr16, wh16, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpre2 = dh2 * _dact(pre2, act_kind)
        dpre2_16 = dpre2.astype(jnp.bfloat16)
        dw2 += jax.lax.dot_general(h1r16, dpre2_16, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        db2 += jnp.sum(dpre2, axis=0, keepdims=True)
        dh1r = jax.lax.dot_general(dpre2_16, w2_16, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dpre1_parts.append(dh1r * _dact_from_h(h1r16, act_kind))
    dpre1 = jnp.concatenate(dpre1_parts, axis=-1)    # (Tr*Wp, R*K)
    dpre1_16 = dpre1.astype(jnp.bfloat16)

    dwc = jax.lax.dot_general(p16, dpre1_16, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbc = jnp.sum(dpre1, axis=0, keepdims=True)

    first = jnp.logical_and(b_idx == 0, t_idx == 0)

    @pl.when(first)
    def _init():
        dwc_ref[...] = dwc
        dbc_ref[...] = dbc
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        dwh_ref[...] = dwh
        dbh_ref[...] = dbh

    @pl.when(jnp.logical_not(first))
    def _acc():
        dwc_ref[...] += dwc
        dbc_ref[...] += dbc
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        dwh_ref[...] += dwh
        dbh_ref[...] += dbh


def _fwd(patches, wc, bc_vec, w2, b2, wh, bh, *, R, K, D, act_kind,
         interpret, save_res=False):
    B, nt, tile, kk = patches.shape
    RK = R * K
    out_spec = pl.BlockSpec((1, 1, tile, R * D), lambda b, t: (b, t, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, nt, tile, R * D), jnp.float32)
    if save_res:
        h_spec = pl.BlockSpec((1, 1, tile, RK), lambda b, t: (b, t, 0, 0))
        h_shape = jax.ShapeDtypeStruct((B, nt, tile, RK), jnp.bfloat16)
        out_spec = (out_spec, h_spec)
        out_shape = (out_shape, h_shape)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, R=R, K=K, D=D, act_kind=act_kind,
                          save_res=save_res),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile, kk), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((kk, RK), lambda b, t: (0, 0)),
            pl.BlockSpec((1, RK), lambda b, t: (0, 0)),
            pl.BlockSpec((K, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda b, t: (0, 0)),
            pl.BlockSpec((1, D), lambda b, t: (0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(patches, wc.astype(jnp.bfloat16), bc_vec.reshape(1, RK),
      w2.astype(jnp.bfloat16), b2.reshape(1, K), wh.astype(jnp.bfloat16),
      bh.reshape(1, D))


def _bwd(res, g, *, R, K, D, act_kind, interpret):
    patches, wc, bc_vec, w2, b2, wh, bh, h1 = res
    B, nt, tile, kk = patches.shape
    RK = R * K

    out_shapes = (
        jax.ShapeDtypeStruct((kk, RK), jnp.float32),
        jax.ShapeDtypeStruct((1, RK), jnp.float32),
        jax.ShapeDtypeStruct((K, K), jnp.float32),
        jax.ShapeDtypeStruct((1, K), jnp.float32),
        jax.ShapeDtypeStruct((K, D), jnp.float32),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, R=R, K=K, D=D, act_kind=act_kind),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile, kk), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((kk, RK), lambda b, t: (0, 0)),
            pl.BlockSpec((1, RK), lambda b, t: (0, 0)),
            pl.BlockSpec((K, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, tile, R * D), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, tile, RK), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=tuple([
            pl.BlockSpec((kk, RK), lambda b, t: (0, 0)),
            pl.BlockSpec((1, RK), lambda b, t: (0, 0)),
            pl.BlockSpec((K, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda b, t: (0, 0)),
            pl.BlockSpec((1, D), lambda b, t: (0, 0)),
        ]),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(patches, wc.astype(jnp.bfloat16), bc_vec.reshape(1, RK),
      w2.astype(jnp.bfloat16), b2.reshape(1, K), wh.astype(jnp.bfloat16), g,
      h1)

    dwc, dbc, dw2, db2, dwh, dbh = outs
    return (None, dwc, dbc.reshape(-1), dw2, db2.reshape(-1), dwh,
            dbh.reshape(-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _fused(R, K, D, act_kind, interpret, patches, wc, bc_vec, w2, b2, wh, bh):
    return _fwd(patches, wc, bc_vec, w2, b2, wh, bh, R=R, K=K, D=D,
                act_kind=act_kind, interpret=interpret)


def _vjp_fwd(R, K, D, act_kind, interpret, patches, wc, bc_vec, w2, b2, wh,
             bh):
    y, h1 = _fwd(patches, wc, bc_vec, w2, b2, wh, bh, R=R, K=K, D=D,
                 act_kind=act_kind, interpret=interpret, save_res=True)
    return y, (patches, wc, bc_vec, w2, b2, wh, bh, h1)


def _vjp_bwd(R, K, D, act_kind, interpret, res, g):
    return _bwd(res, g, R=R, K=K, D=D, act_kind=act_kind, interpret=interpret)


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def fused_lifted_encoder(xp, wc, bc_vec, w2, b2, wh, bh, *, k: int, wp: int,
                         hp: int, R: int, K: int, tile_rows: int = 13,
                         act_kind: str = "leakyrelu",
                         interpret: bool = False):
    """Run the fused encoder.

    xp: (B, n2, n2) or (B, n2, n2, C) pre-padded images (n2 = n + 2*padding).
    wc: (C*k*k, R*K) rotated conv weights as a matmul matrix (channel-major
        rows), r-major output.
    bc_vec: (R*K,) bias tiled over R. w2/b2: mixing; wh/bh: fused heads (K, D).
    Returns (B, nt*tile_rows*wp, R*D) f32; caller slices [:, :hp*wp] and
    reshapes to (B, hp, wp, R, D).
    """
    D = wh.shape[1]
    nt = pl.cdiv(hp, tile_rows)
    patches = build_patches(xp, k, wp, hp, nt, tile_rows)
    patches = jax.lax.stop_gradient(patches)   # images are data, no gradient
    out = _fused(R, K, D, act_kind, interpret, patches, wc, bc_vec, w2, b2,
                 wh, bh)
    B = out.shape[0]
    return out.reshape(B, nt * tile_rows * wp, R * D)
