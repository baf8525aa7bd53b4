"""Fused mixing + heads kernel for the big-k (conv1d-lift) encoder tier.

The conv1d tier (models/encoders.py:_mode_c_xla_matmul) produces the lifted
activation h1 (B*W', H', R*K) bf16 straight from XLA's implicit-GEMM conv;
the remaining per-position work — the 1x1x1 mixing conv and the three fused
heads (reference src/models.py:347-351) — is ~0.26 TFLOP of matmul fwd+bwd
at the cryo-EM scale (utils/flops.py; an earlier ~2.1 T figure here was an
8x miscount) but cost 23.4 ms in XLA because every intermediate (pre2, h2,
dh2, dpre2) round-trips HBM in f32. This kernel runs
the whole chain on VMEM tiles: h1 is read once (bf16), NOTHING is saved for
the backward (h2 is recomputed from h1 in the bwd kernel — one extra mixing
matmul beats the 640 MB residual write+read at EMPIAR scale; its activation
derivative is recovered from the value, as in decoder_pose._dact_from_h),
and the backward emits dh1 bf16 for the conv's weight gradient.

Layout note: tiles are position-major with the (r, k) channel axis last, so
the per-rotation matmuls ride the 128-lane MXU axis; position order (i-major
vs j-major) is irrelevant here — the caller transposes the small (R*D) head
output instead of h1 (18x less HBM traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_mlp import _act
from .decoder_pose import _dact_from_h


def _fwd_kernel(h1_ref, w2_ref, b2_ref, wh_ref, bh_ref, *rest_refs,
                R: int, K: int, KI: int, D: int, G: int, act_kind: str,
                lift: bool):
    """w2_ref/wh_ref hold GROUP-BLOCK-DIAGONAL weights kron(I_G, w2) /
    kron(I_G, wh): G rotations share one (G*KI, G*K) matmul. The mixing is
    block-diagonal over rotations with the SAME w2 for every r, so per-r
    (T,KI)@(KI,K) matmuls are mathematically equal but run ~25 us/tile of MXU
    launch overhead at R=8 (the measured mix_heads bwd cost at EMPIAR
    scale); grouping trades G-fold redundant FLOPs (zeros off the diagonal)
    for R/G-fold fewer, deeper matmuls.

    KI is the per-rotation INPUT width of the mixing (KI == K for mode C's
    square 1x1x1 conv; mode B folds its fc_r rotation collapse + conv2 into
    one rectangular (R_lift*K, K) mixing run at R=1, KI=R_lift*K)."""
    if lift:
        # h1_ref holds the RAW conv output pre1 (no bias, no act); bc is the
        # lift bias — the activation lives in-kernel so its backward does too
        bc_ref, rest_refs = rest_refs[0], rest_refs[1:]
        h1 = _act(h1_ref[0].astype(jnp.float32) + bc_ref[...],
                  act_kind).astype(jnp.bfloat16)
    else:
        h1 = h1_ref[0]                               # (T, R*KI) bf16
    out_ref = rest_refs[0]
    GKI, GD = G * KI, G * D
    b2t = jnp.concatenate([b2_ref[...]] * G, axis=-1)   # (1, G*K)
    bht = jnp.concatenate([bh_ref[...]] * G, axis=-1)   # (1, G*D)
    outs = []
    for gi in range(R // G):
        h1g = h1[:, gi * GKI:(gi + 1) * GKI]
        pre2 = jnp.dot(h1g, w2_ref[...],
                       preferred_element_type=jnp.float32) + b2t
        h2 = _act(pre2, act_kind).astype(jnp.bfloat16)
        outs.append(jnp.dot(h2, wh_ref[...],
                            preferred_element_type=jnp.float32) + bht)
    out_ref[0] = jnp.concatenate(outs, axis=-1)      # (T, R*D)


def _bwd_kernel(h1_ref, w2_ref, b2_ref, wh_ref, g_ref, *rest_refs,
                R: int, K: int, KI: int, D: int, G: int, act_kind: str,
                lift: bool):
    """Grouped like the forward (see _fwd_kernel): the per-group weight
    cotangents come out as (G*K, G*K)/(G*K, G*D) full products whose
    diagonal K-blocks are summed — the off-diagonal blocks correspond to
    the structural zeros of the block-diagonal weights and are discarded.

    h2 is RECOMPUTED from h1 (one extra mixing matmul per tile) instead of
    being saved by the forward: the residual cost a 640 MB h2 write in the
    fwd plus a 640 MB read here (~1.6 ms/step of HBM at EMPIAR scale) where
    the recompute is ~0.4 ms of MXU."""
    t_idx = pl.program_id(0)
    if lift:
        bc_ref = rest_refs[0]
        (dh1_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref,
         dbc_ref) = rest_refs[1:]
        h1 = _act(h1_ref[0].astype(jnp.float32) + bc_ref[...],
                  act_kind).astype(jnp.bfloat16)
    else:
        (dh1_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref) = rest_refs
        h1 = h1_ref[0]
    g = g_ref[0]                                     # (T, R*D) f32
    GK, GKI, GD = G * K, G * KI, G * D
    b2t = jnp.concatenate([b2_ref[...]] * G, axis=-1)   # (1, G*K)

    dw2_full = jnp.zeros((GKI, GK), jnp.float32)
    db2_full = jnp.zeros((1, GK), jnp.float32)
    dwh_full = jnp.zeros((GK, GD), jnp.float32)
    dbh_full = jnp.zeros((1, GD), jnp.float32)
    dh1_parts = []
    dbc_parts = []
    for gi in range(R // G):
        h1g = h1[:, gi * GKI:(gi + 1) * GKI]
        pre2 = jnp.dot(h1g, w2_ref[...],
                       preferred_element_type=jnp.float32) + b2t
        h2g = _act(pre2, act_kind).astype(jnp.bfloat16)
        gg = g[:, gi * GD:(gi + 1) * GD]
        gg16 = gg.astype(jnp.bfloat16)
        dwh_full += jax.lax.dot_general(h2g, gg16, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        dbh_full += jnp.sum(gg, axis=0, keepdims=True)
        dh2 = jax.lax.dot_general(gg16, wh_ref[...], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dpre2 = dh2 * _dact_from_h(h2g, act_kind)
        dpre2_16 = dpre2.astype(jnp.bfloat16)
        dw2_full += jax.lax.dot_general(h1g, dpre2_16,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        db2_full += jnp.sum(dpre2, axis=0, keepdims=True)
        dh1g = jax.lax.dot_general(
            dpre2_16, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if lift:
            # chain through the lift activation here: emit dpre1 bf16 so the
            # conv weight-grad never sees an f32 cotangent (the XLA version
            # of this convert/reshape cost ~7 ms/step at EMPIAR scale)
            dpre1 = dh1g * _dact_from_h(h1g, act_kind)
            dbc_parts.append(jnp.sum(dpre1, axis=0, keepdims=True))
            dh1_parts.append(dpre1.astype(jnp.bfloat16))
        else:
            dh1_parts.append(dh1g.astype(jnp.bfloat16))
    dh1_ref[0] = jnp.concatenate(dh1_parts, axis=-1)
    # collapse the group axis: sum the diagonal (KI, K)-blocks
    dw2 = sum(dw2_full[i * KI:(i + 1) * KI, i * K:(i + 1) * K]
              for i in range(G))
    dwh = sum(dwh_full[i * K:(i + 1) * K, i * D:(i + 1) * D]
              for i in range(G))
    db2 = sum(db2_full[:, i * K:(i + 1) * K] for i in range(G))
    dbh = sum(dbh_full[:, i * D:(i + 1) * D] for i in range(G))
    if lift:
        dbc = jnp.concatenate(dbc_parts, axis=-1)    # (1, R*K)

    @pl.when(t_idx == 0)
    def _init():
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        dwh_ref[...] = dwh
        dbh_ref[...] = dbh
        if lift:
            dbc_ref[...] = dbc

    @pl.when(t_idx != 0)
    def _acc():
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        dwh_ref[...] += dwh
        dbh_ref[...] += dbh
        if lift:
            dbc_ref[...] += dbc


_TILE = 512   # rows per program: 3 bf16 + 2 f32 RK-wide tiles ~= 5 MB


def _group_for(R: int, K: int, group: int = 0, bwd: bool = False) -> int:
    """Rotations per block-diagonal matmul group (kron(I_G, w2) trades
    G-fold redundant FLOPs for R/G-fold fewer matmuls). Three-shape sweep
    (round 5, tools/bench_mix_heads.py, R=8 K=128, repeated post-warmup):
    fwd G=1 wins at ALL of flagship N=152,256 (1.79 vs 1.99 ms), dsprites
    N=211,640 (2.05 vs 2.31) and EMPIAR N=312,208 (3.30 vs 3.47) — round
    4's one-off flagship G=2 fwd advantage did not reproduce (its sweep was
    compile-adjacent; see BENCH_NOTES round-5 entry). The bwd, which runs 6
    matmuls per rotation, prefers G=2 everywhere (flagship 2.4 vs 2.8,
    dsprites 3.65 vs 4.37, EMPIAR 5.5 vs 6.3 ms). Hence the shape-
    independent defaults below; the knob is kept for other (R, K) regimes."""
    if group:
        assert R % group == 0, (R, group)
        return group
    return 2 if (bwd and R % 2 == 0) else 1


def _block_diag(w, G: int):
    """kron(I_G, w) as bf16: G copies of w on the diagonal."""
    return jnp.kron(jnp.eye(G, dtype=jnp.float32),
                    w.astype(jnp.float32)).astype(jnp.bfloat16)


def _tile_for(n_rows: int) -> int:
    """Largest divisor of n_rows in [256, 640], else the default 512.
    An exact division skips the pad/slice around every kernel call — the
    pad+slice of the (N, R*K) tiles measured ~4 ms/step at EMPIAR scale
    (N = B*hp^2 = 312050 = 790 x 395; dsprites 211250 = 338 x 625).

    8-aligned divisors are preferred: Mosaic's bf16 HBM tiling is (8, 128)
    over the last two dims, so the (N, RK) <-> (nt, T, RK) blocked views
    are bitcasts only when T % 8 == 0 — a misaligned T makes XLA re-tile
    h1 on the way in AND dpre1 on the way out (2 x 2 ms at EMPIAR scale).
    Callers that control N can pad it to admit an aligned tile (the lift
    conv pads its batch dim: models/encoders.py::_lift_batch_pad)."""
    best = best_aligned = 0
    for t in range(256, 641):
        if n_rows % t == 0:
            best = t
            if t % 8 == 0:
                best_aligned = t
    return best_aligned or best or _TILE


def _pad_rows(x, T):
    n = x.shape[0]
    pad = (-n) % T
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x, n


def _fwd(h1, w2, b2, wh, bh, *, R, K, D, act_kind, interpret,
         bc=None, group=0):
    lift = bc is not None
    G = _group_for(R, K, group)
    KI = w2.shape[0]
    T = _tile_for(h1.shape[0])
    h1p, n_rows = _pad_rows(h1, T)
    RK = h1.shape[1]                                  # = R * KI
    grid = (h1p.shape[0] // T,)
    rep = lambda i: (0, 0)
    h1v = h1p.reshape(grid[0], T, RK)
    extra_in = [pl.BlockSpec((1, RK), rep)] if lift else []
    extra_args = [bc.reshape(1, RK).astype(jnp.float32)] if lift else []
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, R=R, K=K, KI=KI, D=D, G=G,
                          act_kind=act_kind, lift=lift),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, RK), lambda i: (i, 0, 0)),
            pl.BlockSpec((G * KI, G * K), rep),
            pl.BlockSpec((1, K), rep),
            pl.BlockSpec((G * K, G * D), rep),
            pl.BlockSpec((1, D), rep),
        ] + extra_in,
        out_specs=pl.BlockSpec((1, T, R * D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid[0], T, R * D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(h1v, _block_diag(w2, G), b2.reshape(1, K),
      _block_diag(wh, G), bh.reshape(1, D), *extra_args)
    return out.reshape(-1, R * D)[:n_rows]


def _bwd(res, g, *, R, K, D, act_kind, interpret, group=0):
    h1, w2, b2, wh, bh, bc = res
    lift = bc is not None
    G = _group_for(R, K, group, bwd=True)
    KI = w2.shape[0]
    n_rows, RK = h1.shape
    T = _tile_for(n_rows)
    h1p, _ = _pad_rows(h1, T)
    nt = h1p.shape[0] // T
    gp, _ = _pad_rows(g, T)   # zero rows -> zero grads, safe for accumulators
    rep = lambda i: (0, 0)
    extra_in = [pl.BlockSpec((1, RK), rep)] if lift else []
    extra_args = [bc.reshape(1, RK).astype(jnp.float32)] if lift else []
    extra_out_specs = [pl.BlockSpec((1, RK), rep)] if lift else []
    extra_out_shape = ([jax.ShapeDtypeStruct((1, RK), jnp.float32)]
                       if lift else [])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, R=R, K=K, KI=KI, D=D, G=G,
                          act_kind=act_kind, lift=lift),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, T, RK), lambda i: (i, 0, 0)),
            pl.BlockSpec((G * KI, G * K), rep),
            pl.BlockSpec((1, K), rep),
            pl.BlockSpec((G * K, G * D), rep),
            pl.BlockSpec((1, T, R * D), lambda i: (i, 0, 0)),
        ] + extra_in,
        out_specs=tuple(
            [pl.BlockSpec((1, T, RK), lambda i: (i, 0, 0)),
             pl.BlockSpec((KI, K), rep),
             pl.BlockSpec((1, K), rep),
             pl.BlockSpec((K, D), rep),
             pl.BlockSpec((1, D), rep)] + extra_out_specs),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nt, T, RK), jnp.bfloat16),
             jax.ShapeDtypeStruct((KI, K), jnp.float32),
             jax.ShapeDtypeStruct((1, K), jnp.float32),
             jax.ShapeDtypeStruct((K, D), jnp.float32),
             jax.ShapeDtypeStruct((1, D), jnp.float32)] + extra_out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(h1p.reshape(nt, T, RK), _block_diag(w2, G), b2.reshape(1, K),
      _block_diag(wh, G), gp.reshape(nt, T, R * D), *extra_args)
    if lift:
        dh1, dw2, db2, dwh, dbh, dbc = outs
        return (dh1.reshape(-1, RK)[:n_rows], dw2, db2.reshape(K), dwh,
                dbh.reshape(D), dbc.reshape(RK))
    dh1, dw2, db2, dwh, dbh = outs
    return (dh1.reshape(-1, RK)[:n_rows], dw2, db2.reshape(K), dwh,
            dbh.reshape(D))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused(R, K, D, act_kind, interpret, group, h1, w2, b2, wh, bh):
    return _fwd(h1, w2, b2, wh, bh, R=R, K=K, D=D, act_kind=act_kind,
                interpret=interpret, group=group)


def _vjp_fwd(R, K, D, act_kind, interpret, group, h1, w2, b2, wh, bh):
    out = _fwd(h1, w2, b2, wh, bh, R=R, K=K, D=D, act_kind=act_kind,
               interpret=interpret, group=group)
    return out, (h1, w2, b2, wh, bh, None)


def _vjp_bwd(R, K, D, act_kind, interpret, group, res, g):
    return _bwd(res, g, R=R, K=K, D=D, act_kind=act_kind,
                interpret=interpret, group=group)


_fused.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _fused_lift(R, K, D, act_kind, interpret, group, pre1, bc, w2, b2, wh,
                bh):
    return _fwd(pre1, w2, b2, wh, bh, R=R, K=K, D=D, act_kind=act_kind,
                interpret=interpret, bc=bc, group=group)


def _vjp_fwd_lift(R, K, D, act_kind, interpret, group, pre1, bc, w2, b2, wh,
                  bh):
    out = _fwd(pre1, w2, b2, wh, bh, R=R, K=K, D=D, act_kind=act_kind,
               interpret=interpret, bc=bc, group=group)
    return out, (pre1, w2, b2, wh, bh, bc)


def _vjp_bwd_lift(R, K, D, act_kind, interpret, group, res, g):
    dpre1, dw2, db2, dwh, dbh, dbc = _bwd(
        res, g, R=R, K=K, D=D, act_kind=act_kind, interpret=interpret,
        group=group)
    return (dpre1, dbc, dw2, db2, dwh, dbh)


_fused_lift.defvjp(_vjp_fwd_lift, _vjp_bwd_lift)


def fused_mix_heads(h1, w2, b2, wh, bh, *, R: int, K: int,
                    act_kind: str = "leakyrelu", interpret: bool = False,
                    group: int = 0):
    """h1: (N_positions, R*K_in) bf16 (any position order); w2/b2 mixing
    (K_in, K) — rectangular allowed (K_in = w2.shape[0]; K_in == K for the
    mode-C square mixing, K_in = R_lift*K for mode B's folded rotation
    collapse at R=1); wh/bh fused heads (K, D). Returns (N_positions, R*D)
    f32. Differentiable in h1 and all weights. group: rotations per
    block-diagonal matmul group (0 = auto, _group_for)."""
    D = wh.shape[1]
    return _fused(R, K, D, act_kind, interpret, group, h1, w2, b2, wh, bh)


def fused_lift_act_mix_heads(pre1, bc, w2, b2, wh, bh, *, R: int, K: int,
                             act_kind: str = "leakyrelu",
                             interpret: bool = False, group: int = 0):
    """Like fused_mix_heads but takes the RAW lift-conv output pre1 (bf16,
    (N_positions, R*K), no bias/activation) plus the lift bias bc (R*K,):
    h1 = act(pre1 + bc) lives in-kernel, and the backward emits the bf16
    cotangent dpre1 directly for the conv weight-grad — the XLA version of
    that activation backward converted the 1024-wide cotangent to f32 and
    back (~7 ms/step of convert/reshape at EMPIAR scale). Differentiable in
    pre1, bc and all weights."""
    D = wh.shape[1]
    return _fused_lift(R, K, D, act_kind, interpret, group, pre1, bc, w2, b2,
                       wh, bh)
