"""Big-kernel encoder path (k ~ 64: cryo-EM particles, dsprites).

At k = 64 the rotated filter matrix is (4096, R*K) — its bf16 copy alone is
8.4 MB and the f32 dWc accumulator 16.8 MB, so the single-pass fused kernel
(lifted_encoder.py) cannot fit scoped VMEM. This variant:

  forward  — grid (S, B, nt): the R axis is split into S groups of rotations
             (wc column halves), each pass a pure matmul + mixing + heads over
             the XLA-built patch tiles. No redundant compute (the rotation
             groups are independent); patches are re-read S times (HBM-cheap).
  backward — two phases:
             A (Pallas, same S split): recompute pre1/h1 per rotation group,
               chain head/mixing gradients, emit dpre1 to HBM in bf16 and
               accumulate the small dW2/dWh/db* on-chip.
             B (XLA): dWc = patches^T @ dpre1 as one large matmul — the
               inherent conv-weight-gradient FLOPs at XLA's ~100 TF/s matmul
               throughput — and dbc as a row-sum.

Replaces the XLA-materialized lift path for these shapes (which writes the
(B, M, R*K) activations to HBM in f32 several times per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_mlp import _act, _dact
from .lifted_encoder import build_patches


def bigk_supported(cfg, splits: int = 2) -> bool:
    if cfg.mode != "C" or cfg.in_channels != 1:
        return False
    kk = cfg.kernels_size ** 2
    rk = cfg.groupconv * cfg.kernels_num
    if cfg.groupconv % splits:
        return False
    # wc split bf16 + patch tile + per-split activations, x1.4 Mosaic fudge
    tile = 2 * (cfg.image_dim + 2 * cfg.padding - cfg.kernels_size + 1)
    est = kk * rk // splits * 2 + tile * kk * 2 + 3 * tile * rk // splits * 4
    return est * 1.4 < 14 * 1024 * 1024


def _fwd_kernel(p_ref, wc_ref, bc_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                out_ref, *, Rs: int, K: int, D: int, act_kind: str):
    """One rotation group: wc_ref (kk, Rs*K); out (tile, Rs*D)."""
    p16 = p_ref[0, 0]
    pre1 = jnp.dot(p16, wc_ref[...],
                   preferred_element_type=jnp.float32) + bc_ref[0]
    h1 = _act(pre1, act_kind)
    outs = []
    for r in range(Rs):
        h1r = h1[:, r * K:(r + 1) * K].astype(jnp.bfloat16)
        pre2 = jnp.dot(h1r, w2_ref[...],
                       preferred_element_type=jnp.float32) + b2_ref[...]
        h2 = _act(pre2, act_kind).astype(jnp.bfloat16)
        outs.append(jnp.dot(h2, wh_ref[...],
                            preferred_element_type=jnp.float32) + bh_ref[...])
    out_ref[0, 0, 0] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(p_ref, wc_ref, bc_ref, w2_ref, b2_ref, wh_ref, g_ref,
                dpre1_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref, *,
                Rs: int, K: int, D: int, act_kind: str):
    s_idx = pl.program_id(0)
    b_idx = pl.program_id(1)
    t_idx = pl.program_id(2)

    p16 = p_ref[0, 0]
    pre1 = jnp.dot(p16, wc_ref[...],
                   preferred_element_type=jnp.float32) + bc_ref[0]
    h1 = _act(pre1, act_kind)
    g2 = g_ref[0, 0, 0]                              # (tile, Rs*D)
    w2_16 = w2_ref[...]
    wh16 = wh_ref[...]

    dwh = jnp.zeros(dwh_ref.shape, jnp.float32)
    dbh = jnp.zeros(dbh_ref.shape, jnp.float32)
    dw2 = jnp.zeros(dw2_ref.shape, jnp.float32)
    db2 = jnp.zeros(db2_ref.shape, jnp.float32)
    dpre1_parts = []
    for r in range(Rs):
        h1r16 = h1[:, r * K:(r + 1) * K].astype(jnp.bfloat16)
        pre2 = jnp.dot(h1r16, w2_16,
                       preferred_element_type=jnp.float32) + b2_ref[...]
        h2_16 = _act(pre2, act_kind).astype(jnp.bfloat16)
        gr16 = g2[:, r * D:(r + 1) * D].astype(jnp.bfloat16)

        dwh += jax.lax.dot_general(h2_16, gr16, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dbh += jnp.sum(g2[:, r * D:(r + 1) * D], axis=0, keepdims=True)
        dh2 = jax.lax.dot_general(gr16, wh16, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpre2 = dh2 * _dact(pre2, act_kind)
        dpre2_16 = dpre2.astype(jnp.bfloat16)
        dw2 += jax.lax.dot_general(h1r16, dpre2_16, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        db2 += jnp.sum(dpre2, axis=0, keepdims=True)
        dh1r = jax.lax.dot_general(dpre2_16, w2_16, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dpre1_parts.append(dh1r * _dact(pre1[:, r * K:(r + 1) * K], act_kind))
    dpre1_ref[0, 0, 0] = jnp.concatenate(dpre1_parts, axis=-1).astype(
        jnp.bfloat16)

    first = jnp.logical_and(
        jnp.logical_and(s_idx == 0, b_idx == 0), t_idx == 0)

    @pl.when(first)
    def _init():
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        dwh_ref[...] = dwh
        dbh_ref[...] = dbh

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        dwh_ref[...] += dwh
        dbh_ref[...] += dbh


def _fwd(patches, wc, bc_vec, w2, b2, wh, bh, *, S, R, K, D, act_kind,
         interpret):
    B, nt, tile, kk = patches.shape
    Rs = R // S
    RKs = Rs * K
    # wc columns are r-major, so rotation group s owns columns
    # [s*RKs, (s+1)*RKs): expressible as a column-blocked 2-D BlockSpec
    wc16 = wc.astype(jnp.bfloat16)
    bc3 = bc_vec.reshape(S, 1, RKs)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, Rs=Rs, K=K, D=D, act_kind=act_kind),
        grid=(S, B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile, kk), lambda s, b, t: (b, t, 0, 0)),
            pl.BlockSpec((kk, RKs), lambda s, b, t: (0, s)),
            pl.BlockSpec((1, 1, RKs), lambda s, b, t: (s, 0, 0)),
            pl.BlockSpec((K, K), lambda s, b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda s, b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda s, b, t: (0, 0)),
            pl.BlockSpec((1, D), lambda s, b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, tile, Rs * D),
                               lambda s, b, t: (b, t, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nt, S, tile, Rs * D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(patches, wc16, bc3, w2.astype(jnp.bfloat16), b2.reshape(1, K),
      wh.astype(jnp.bfloat16), bh.reshape(1, D))


def _bwd(res, g, *, S, R, K, D, act_kind, interpret):
    patches, wc, bc_vec, w2, b2, wh, bh = res
    B, nt, tile, kk = patches.shape
    Rs = R // S
    RKs = Rs * K
    wc16 = wc.astype(jnp.bfloat16)
    bc3 = bc_vec.reshape(S, 1, RKs)

    out_shapes = (
        jax.ShapeDtypeStruct((B, nt, S, tile, RKs), jnp.bfloat16),  # dpre1
        jax.ShapeDtypeStruct((K, K), jnp.float32),
        jax.ShapeDtypeStruct((1, K), jnp.float32),
        jax.ShapeDtypeStruct((K, D), jnp.float32),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
    )
    dpre1, dw2, db2, dwh, dbh = pl.pallas_call(
        functools.partial(_bwd_kernel, Rs=Rs, K=K, D=D, act_kind=act_kind),
        grid=(S, B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, tile, kk), lambda s, b, t: (b, t, 0, 0)),
            pl.BlockSpec((kk, RKs), lambda s, b, t: (0, s)),
            pl.BlockSpec((1, 1, RKs), lambda s, b, t: (s, 0, 0)),
            pl.BlockSpec((K, K), lambda s, b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda s, b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda s, b, t: (0, 0)),
            pl.BlockSpec((1, 1, 1, tile, Rs * D),
                         lambda s, b, t: (b, t, s, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, tile, RKs),
                         lambda s, b, t: (b, t, s, 0, 0)),
            pl.BlockSpec((K, K), lambda s, b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda s, b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda s, b, t: (0, 0)),
            pl.BlockSpec((1, D), lambda s, b, t: (0, 0)),
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(patches, wc16, bc3, w2.astype(jnp.bfloat16), b2.reshape(1, K),
      wh.astype(jnp.bfloat16), g)

    # phase B in XLA: the conv weight gradient as one big matmul. dpre1's
    # column order is s-major = r-major, matching wc's columns.
    p2 = patches.reshape(B * nt * tile, kk)
    dp2 = jnp.transpose(dpre1, (0, 1, 3, 2, 4)).reshape(B * nt * tile, R * K)
    dwc = jax.lax.dot_general(p2, dp2, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbc = jnp.sum(dp2.astype(jnp.float32), axis=0)
    return (None, dwc, dbc, dw2, db2.reshape(-1), dwh, dbh.reshape(-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused(S, R, K, D, act_kind, interpret, patches, wc, bc_vec, w2, b2, wh,
           bh):
    return _fwd(patches, wc, bc_vec, w2, b2, wh, bh, S=S, R=R, K=K, D=D,
                act_kind=act_kind, interpret=interpret)


def _vjp_fwd(S, R, K, D, act_kind, interpret, patches, wc, bc_vec, w2, b2,
             wh, bh):
    y = _fwd(patches, wc, bc_vec, w2, b2, wh, bh, S=S, R=R, K=K, D=D,
             act_kind=act_kind, interpret=interpret)
    return y, (patches, wc, bc_vec, w2, b2, wh, bh)


def _vjp_bwd(S, R, K, D, act_kind, interpret, res, g):
    return _bwd(res, g, S=S, R=R, K=K, D=D, act_kind=act_kind,
                interpret=interpret)


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def fused_lifted_encoder_bigk(xp, wc, bc_vec, w2, b2, wh, bh, *, k: int,
                              wp: int, hp: int, R: int, K: int,
                              splits: int = 2, tile_rows: int = 2,
                              act_kind: str = "leakyrelu",
                              interpret: bool = False):
    """Like lifted_encoder.fused_lifted_encoder but with the rotation axis
    split over a grid dimension and a two-phase backward. Returns
    (B, nt*tile_rows*wp, R*D)."""
    D = wh.shape[1]
    nt = pl.cdiv(hp, tile_rows)
    patches = build_patches(xp, k, wp, hp, nt, tile_rows)
    patches = jax.lax.stop_gradient(patches)
    out = _fused(splits, R, K, D, act_kind, interpret, patches, wc, bc_vec,
                 w2, b2, wh, bh)
    B = out.shape[0]
    # (B, nt, S, tile, Rs*D) -> (B, nt*tile, S*Rs*D = R*D), s-major = r-major
    out = jnp.transpose(out, (0, 1, 3, 2, 4))
    return out.reshape(B, nt * tile_rows * wp, R * D)
