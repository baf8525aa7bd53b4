"""Fused lifted-group-conv + heads encoder kernel (mode C, C_in=1).

The TARGET-VAE encoder lifts the image with an image-sized rotated filter bank
(k = 28..65, R*K = up to 2048 output channels), applies a 1x1x1 mixing conv and
three 1x1x1 heads (reference src/models.py:346-351). XLA's conv lowering
reaches ~42 TF/s and materializes the (B, H', W', R, K) lift tensor (hundreds
of MB) in HBM between every op.

This kernel processes one tile of output rows per grid step entirely in VMEM:
  patches   P  (Tr*W', k*k)      built by static slice-stacking (im2col)
  lift      h1 = act(P @ Wc + bc)     -- ONE full-contraction MXU matmul
  mixing    h2 = act(h1' @ W2 + b2)   -- over the K axis, R folded into rows
  heads     out = h2 @ Wh + bh        -- attn/theta/z fused in one matmul
and writes only the tiny head outputs, laid out (B, R*D, H'*W') so the HBM
array has minimal tile padding. The lift tensor never exists in HBM.

Input is the pre-padded image; the rotated filter matrix Wc is built outside
(ops/rotate.py gather tables), so its gradient chains back to the canonical
(out, in, rot_in, k, k) weight through XLA autodiff. The backward kernel
recomputes the forward tiles and accumulates weight gradients across the
sequential grid; no input-image gradient is needed (images are data).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_mlp import _act, _dact


def encoder_kernel_supported(cfg) -> bool:
    return cfg.mode == "C" and cfg.in_channels == 1


def _patches(img_ref, t_idx, tile_rows, wp, k, hp):
    """Build the im2col patch matrix for a tile of output rows.

    img_ref: (1, nrows, ncols) f32 VMEM ref (whole padded image). Returns
    (tile_rows * wp, k * k) where row ti*wp + j holds the kxk patch at output
    position (t_idx*tile_rows + ti, j); padded rows (beyond hp) are zeroed.
    """
    i0 = t_idx * tile_rows
    # ref-level dynamic slice (value-level dynamic_slice is not lowered);
    # patch assembly stays f32 (Mosaic can't insert minor dims on 16-bit),
    # cast to bf16 at the end
    block = img_ref[0, pl.ds(i0, tile_rows + k - 1), :]
    # stage 1: columns — Q[r, j, dj] = block[r, j+dj]
    q = jnp.stack([block[:, dj:dj + wp] for dj in range(k)], axis=-1)
    # stage 2: rows, concatenated along the LAST axis so the final collapse is
    # the Mosaic-supported (A, B, C) -> (A*B, C) leading-dim reshape:
    # P4[ti, j, di*k + dj] = Q[ti+di, j, dj]
    p4 = jnp.concatenate([q[di:di + tile_rows] for di in range(k)], axis=-1)
    p = p4.reshape(tile_rows * wp, k * k)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_rows * wp, 1), 0)
    valid = (i0 + rows // wp) < hp
    return jnp.where(valid, p, 0.0).astype(jnp.bfloat16), valid


def _fwd_kernel(img_ref, wc_ref, bc_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                out_ref, *, k: int, wp: int, hp: int, tile_rows: int, R: int,
                K: int, D: int, act_kind: str):
    t_idx = pl.program_id(1)
    p16, _ = _patches(img_ref, t_idx, tile_rows, wp, k, hp)
    pre1 = jnp.dot(p16, wc_ref[...],
                   preferred_element_type=jnp.float32) + bc_ref[...]
    h1 = _act(pre1, act_kind)                            # (Tr*Wp, R*K)
    # mixing + heads per rotation (static loop keeps every op 2-D; Mosaic has
    # no multi-axis reshapes): out[:, r*D:(r+1)*D] = heads(mix(h1_r))
    outs = []
    for r in range(R):
        h1r = h1[:, r * K:(r + 1) * K].astype(jnp.bfloat16)
        pre2 = jnp.dot(h1r, w2_ref[...],
                       preferred_element_type=jnp.float32) + b2_ref[...]
        h2 = _act(pre2, act_kind).astype(jnp.bfloat16)
        outs.append(jnp.dot(h2, wh_ref[...],
                            preferred_element_type=jnp.float32) + bh_ref[...])
    out_ref[0, 0] = jnp.concatenate(outs, axis=-1)       # (Tr*Wp, R*D)


def _pad_rows(xp, k, hp, tile_rows):
    """Pad image rows so every tile's (tile_rows + k - 1)-row read window is
    in bounds (lax.dynamic_slice clamps at the edge, which would silently
    shift the last tile's patches)."""
    B, n2, _ncols = xp.shape
    nt = pl.cdiv(hp, tile_rows)
    need = nt * tile_rows + k - 1
    if need > n2:
        xp = jnp.pad(xp, ((0, 0), (0, need - n2), (0, 0)))
    return xp


def _fwd(xp, wc, bc_vec, w2, b2, wh, bh, *, k, wp, hp, R, K, D, tile_rows,
         act_kind, interpret):
    xp = _pad_rows(xp, k, hp, tile_rows)
    B, nrows, ncols = xp.shape
    nt = pl.cdiv(hp, tile_rows)
    wc16 = wc.astype(jnp.bfloat16)
    w2_16 = w2.astype(jnp.bfloat16)
    wh16 = wh.astype(jnp.bfloat16)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, wp=wp, hp=hp, tile_rows=tile_rows,
                          R=R, K=K, D=D, act_kind=act_kind),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, nrows, ncols), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((k * k, R * K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, R * K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda b, t: (0, 0)),
            pl.BlockSpec((1, D), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_rows * wp, R * D),
                               lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nt, tile_rows * wp, R * D),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xp, wc16, bc_vec.reshape(1, R * K), w2_16, b2.reshape(1, K), wh16,
      bh.reshape(1, D))


def _bwd_kernel(img_ref, wc_ref, bc_ref, w2_ref, b2_ref, wh_ref, g_ref,
                dwc_ref, dbc_ref, dw2_ref, db2_ref, dwh_ref, dbh_ref, *,
                k: int, wp: int, hp: int, tile_rows: int, R: int, K: int,
                D: int, act_kind: str):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    p16, valid = _patches(img_ref, t_idx, tile_rows, wp, k, hp)
    pre1 = jnp.dot(p16, wc_ref[...].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + bc_ref[...]
    h1 = _act(pre1, act_kind)

    # incoming grad (Tr*Wp, R*D); zero padded rows so they can't pollute the
    # weight accumulators
    g2 = jnp.where(valid, g_ref[0, 0], 0.0)
    w2_16 = w2_ref[...].astype(jnp.bfloat16)
    wh16 = wh_ref[...].astype(jnp.bfloat16)

    dwh = jnp.zeros((K, D), jnp.float32)
    dbh = jnp.zeros((1, D), jnp.float32)
    dw2 = jnp.zeros((K, K), jnp.float32)
    db2 = jnp.zeros((1, K), jnp.float32)
    dpre1_parts = []
    for r in range(R):
        h1r = h1[:, r * K:(r + 1) * K]
        h1r16 = h1r.astype(jnp.bfloat16)
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
        dpre1_parts.append(dh1r * _dact(pre1[:, r * K:(r + 1) * K], act_kind))
    dpre1 = jnp.concatenate(dpre1_parts, axis=-1)        # (Tr*Wp, R*K)
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


def _bwd(res, g, *, k, wp, hp, R, K, D, tile_rows, act_kind, interpret):
    xp, wc, bc_vec, w2, b2, wh, bh = res
    xp = _pad_rows(xp, k, hp, tile_rows)
    B, nrows, ncols = xp.shape
    nt = pl.cdiv(hp, tile_rows)

    out_shapes = (
        jax.ShapeDtypeStruct((k * k, R * K), jnp.float32),
        jax.ShapeDtypeStruct((1, R * K), jnp.float32),
        jax.ShapeDtypeStruct((K, K), jnp.float32),
        jax.ShapeDtypeStruct((1, K), jnp.float32),
        jax.ShapeDtypeStruct((K, D), jnp.float32),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, wp=wp, hp=hp, tile_rows=tile_rows,
                          R=R, K=K, D=D, act_kind=act_kind),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, nrows, ncols), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((k * k, R * K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, R * K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda b, t: (0, 0)),
            pl.BlockSpec((1, 1, tile_rows * wp, R * D),
                         lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=tuple([
            pl.BlockSpec((k * k, R * K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, R * K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, K), lambda b, t: (0, 0)),
            pl.BlockSpec((1, K), lambda b, t: (0, 0)),
            pl.BlockSpec((K, D), lambda b, t: (0, 0)),
            pl.BlockSpec((1, D), lambda b, t: (0, 0)),
        ]),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(xp, wc.astype(jnp.bfloat16), bc_vec.reshape(1, R * K), w2, b2.reshape(1, K),
      wh, g)

    dwc, dbc, dw2, db2, dwh, dbh = outs
    return (None, dwc, dbc.reshape(-1), dw2, db2.reshape(-1), dwh,
            dbh.reshape(-1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8))
def _fused(k, wp, hp, R, K, D, tile_rows, act_kind, interpret,
           xp, wc, bc_vec, w2, b2, wh, bh):
    return _fwd(xp, wc, bc_vec, w2, b2, wh, bh, k=k, wp=wp, hp=hp, R=R, K=K,
                D=D, tile_rows=tile_rows, act_kind=act_kind,
                interpret=interpret)


def _vjp_fwd(k, wp, hp, R, K, D, tile_rows, act_kind, interpret,
             xp, wc, bc_vec, w2, b2, wh, bh):
    y = _fwd(xp, wc, bc_vec, w2, b2, wh, bh, k=k, wp=wp, hp=hp, R=R, K=K, D=D,
             tile_rows=tile_rows, act_kind=act_kind, interpret=interpret)
    return y, (xp, wc, bc_vec, w2, b2, wh, bh)


def _vjp_bwd(k, wp, hp, R, K, D, tile_rows, act_kind, interpret, res, g):
    return _bwd(res, g, k=k, wp=wp, hp=hp, R=R, K=K, D=D,
                tile_rows=tile_rows, act_kind=act_kind, interpret=interpret)


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def fused_lifted_encoder(xp, wc, bc_vec, w2, b2, wh, bh, *, k: int, wp: int,
                         hp: int, R: int, K: int, tile_rows: int = 8,
                         act_kind: str = "leakyrelu",
                         interpret: bool = False):
    """Run the fused encoder.

    xp: (B, n2, n2) pre-padded images (n2 = n + 2*padding).
    wc: (k*k, R*K) rotated conv weights as a matmul matrix, r-major output.
    bc_vec: (R*K,) bias tiled over R. w2/b2: mixing; wh/bh: fused heads (K, D).
    Returns (B, nt*tile_rows*wp, R*D) f32; caller slices [:, :hp*wp] and
    reshapes to (B, hp, wp, R, D).
    """
    D = wh.shape[1]
    out = _fused(k, wp, hp, R, K, D, tile_rows, act_kind, interpret,
                 xp, wc, bc_vec, w2, b2, wh, bh)
    # (B, nt, Tr*wp, R*D) -> (B, nt*Tr*wp, R*D); the cotangent of this
    # reshape is handled by XLA outside the custom-vjp boundary
    B, nt = out.shape[0], out.shape[1]
    return out.reshape(B, nt * tile_rows * wp, R * D)
