"""Fused SpatialGenerator decoder kernel.

The decoder evaluates, for every pixel of every image,
    y = W3 act( W2 act( W1 cos(x Wf + bf) + b1 + hz ) + b2 ) + b3
where x are per-image transformed coordinates and hz = z @ Wz is the per-image
latent projection. XLA materializes the (B*N, 1024) Fourier features and both
(B*N, 512) hidden activations in HBM (≈2 GB of traffic per pass at batch 100);
this kernel streams coordinate tiles through VMEM and touches HBM only for x
(tiny) and y, turning an HBM-bound op into an MXU-bound one. Matmuls run in
bf16 with f32 accumulation; the Fourier phase is computed in f32 on the VPU.

The backward pass is a second kernel that recomputes the forward tiles
(VMEM-resident, cheaper than saving them) and accumulates weight gradients
across the sequential TPU grid.

Reference behavior being accelerated: src/models.py:95-123 with
RandomFourierEmbedding2d (src/models.py:53-58).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.01


def _act(h, kind: str):
    if kind == "tanh":
        return jnp.tanh(h)
    return jnp.where(h >= 0, h, LEAKY_SLOPE * h)


def _dact(pre, kind: str):
    if kind == "tanh":
        t = jnp.tanh(pre)
        return 1.0 - t * t
    return jnp.where(pre >= 0, 1.0, LEAKY_SLOPE)


def _dact_from_h(h, kind: str):
    """Activation derivative recovered from the (bf16) activation value:
    leaky keeps the sign of its input, tanh' = 1 - tanh^2. Lets backward
    kernels skip recomputing the forward matmul chain when the activation was
    saved as a residual."""
    hf = h.astype(jnp.float32)   # compare in f32: Mosaic can't relayout the
    if kind == "tanh":           # i1 mask a bf16 compare produces here
        return 1.0 - hf * hf
    return jnp.where(hf >= 0, 1.0, LEAKY_SLOPE)


def decoder_kernel_supported(cfg) -> bool:
    """Kernel covers the flagship decoder shape: fourier on, 2 layers,
    no resid."""
    return (cfg.fourier_expansion and cfg.num_layers == 2 and not cfg.resid
            and cfg.z_dim > 0)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, hz_ref, wf_ref, bf_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, y_ref, *, act_kind: str):
    b_idx = pl.program_id(0)
    x = x_ref[...]                                     # (1, T, 2) f32
    f = jnp.cos(x[0, :, 0:1] * wf_ref[0:1, :] + x[0, :, 1:2] * wf_ref[1:2, :]
                + bf_ref[...])                         # (T, F) f32, VPU
    f16 = f.astype(jnp.bfloat16)
    pre1 = jnp.dot(f16, w1_ref[...],
                   preferred_element_type=jnp.float32)  # (T, H)
    pre1 = pre1 + b1_ref[...] + hz_ref[pl.ds(b_idx, 1), :]
    h1 = _act(pre1, act_kind).astype(jnp.bfloat16)
    pre2 = jnp.dot(h1, w2_ref[...], preferred_element_type=jnp.float32)
    pre2 = pre2 + b2_ref[...]
    h2 = _act(pre2, act_kind).astype(jnp.bfloat16)
    y = jnp.dot(h2, w3_ref[...], preferred_element_type=jnp.float32)
    y_ref[0] = y + b3_ref[...]


def _fwd(x, hz, wf, bf, w1, b1, w2, b2, w3, b3, *, act_kind: str,
         tile: int, interpret: bool):
    B, N, _ = x.shape
    F = wf.shape[1]
    H = w1.shape[1]
    n_out = w3.shape[1]
    nt = pl.cdiv(N, tile)

    w1_16 = w1.astype(jnp.bfloat16)
    w2_16 = w2.astype(jnp.bfloat16)
    w3_16 = w3.astype(jnp.bfloat16)

    return pl.pallas_call(
        functools.partial(_fwd_kernel, act_kind=act_kind),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, 2), lambda b, t: (b, t, 0)),
            pl.BlockSpec((B, H), lambda b, t: (0, 0)),
            pl.BlockSpec((2, F), lambda b, t: (0, 0)),
            pl.BlockSpec((1, F), lambda b, t: (0, 0)),
            pl.BlockSpec((F, H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, n_out), lambda b, t: (0, 0)),
            pl.BlockSpec((1, n_out), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, n_out), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(x, hz, wf, bf.reshape(1, F), w1_16, b1.reshape(1, H), w2_16,
      b2.reshape(1, H), w3_16, b3.reshape(1, n_out))


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, hz_ref, wf_ref, bf_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, g_ref,
                dx_ref, dhz_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                db3_ref, *, act_kind: str, n_valid: int, tile: int):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)

    # recompute the forward tile; zero padded rows FIRST — out-of-bounds tile
    # reads contain garbage (possibly NaN/inf) which would poison the weight
    # accumulators through NaN * 0 = NaN in the dW matmuls
    x = x_ref[...]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (x.shape[1], 1), 0) \
        + t_idx * tile
    row_ok = row_ids < n_valid                          # (T, 1)
    x = jnp.where(row_ok[None], x, 0.0)
    arg = (x[0, :, 0:1] * wf_ref[0:1, :] + x[0, :, 1:2] * wf_ref[1:2, :]
           + bf_ref[...])                              # (T, F)
    f = jnp.cos(arg)
    f = jnp.where(row_ok, f, 0.0)
    f16 = f.astype(jnp.bfloat16)
    pre1 = (jnp.dot(f16, w1_ref[...].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + b1_ref[...] + hz_ref[pl.ds(b_idx, 1), :])
    h1 = _act(pre1, act_kind)
    h1_16 = h1.astype(jnp.bfloat16)
    pre2 = jnp.dot(h1_16, w2_ref[...].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) + b2_ref[...]
    h2 = _act(pre2, act_kind)
    h2_16 = h2.astype(jnp.bfloat16)

    g = g_ref[0]                                       # (T, n_out) f32
    g = jnp.where(row_ok, g, 0.0)
    g16 = g.astype(jnp.bfloat16)

    dw3 = jax.lax.dot_general(h2_16, g16, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db3 = jnp.sum(g, axis=0, keepdims=True)
    dh2 = jax.lax.dot_general(g16, w3_ref[...].astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dpre2 = dh2 * _dact(pre2, act_kind)
    dpre2_16 = dpre2.astype(jnp.bfloat16)

    dw2 = jax.lax.dot_general(h1_16, dpre2_16, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(dpre2, axis=0, keepdims=True)
    dh1 = jax.lax.dot_general(dpre2_16, w2_ref[...].astype(jnp.bfloat16),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dpre1 = dh1 * _dact(pre1, act_kind)
    dpre1_16 = dpre1.astype(jnp.bfloat16)

    dw1 = jax.lax.dot_general(f16, dpre1_16, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre1, axis=0, keepdims=True)

    df = jax.lax.dot_general(dpre1_16, w1_ref[...].astype(jnp.bfloat16),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    darg = -jnp.sin(arg) * df                          # (T, F) f32
    dx0 = jnp.sum(darg * wf_ref[0:1, :], axis=1)
    dx1 = jnp.sum(darg * wf_ref[1:2, :], axis=1)
    dx_ref[0] = jnp.stack([dx0, dx1], axis=-1)

    # grid-sequential accumulation
    first = jnp.logical_and(b_idx == 0, t_idx == 0)

    @pl.when(first)
    def _init():
        dw1_ref[...] = dw1
        db1_ref[...] = db1
        dw2_ref[...] = dw2
        db2_ref[...] = db2
        dw3_ref[...] = dw3
        db3_ref[...] = db3
        dhz_ref[...] = jnp.zeros(dhz_ref.shape, dhz_ref.dtype)

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw1_ref[...] += dw1
        db1_ref[...] += db1
        dw2_ref[...] += dw2
        db2_ref[...] += db2
        dw3_ref[...] += dw3
        db3_ref[...] += db3

    dhz_ref[pl.ds(b_idx, 1), :] += db1


def _bwd(res, g, *, act_kind: str, tile: int, interpret: bool):
    x, hz, wf, bf, w1, b1, w2, b2, w3, b3 = res
    B, N, _ = x.shape
    F = wf.shape[1]
    H = w1.shape[1]
    n_out = w3.shape[1]
    nt = pl.cdiv(N, tile)

    out_shapes = (
        jax.ShapeDtypeStruct((B, N, 2), jnp.float32),    # dx
        jax.ShapeDtypeStruct((B, H), jnp.float32),       # dhz
        jax.ShapeDtypeStruct((F, H), jnp.float32),       # dw1
        jax.ShapeDtypeStruct((1, H), jnp.float32),       # db1
        jax.ShapeDtypeStruct((H, H), jnp.float32),       # dw2
        jax.ShapeDtypeStruct((1, H), jnp.float32),       # db2
        jax.ShapeDtypeStruct((H, n_out), jnp.float32),   # dw3
        jax.ShapeDtypeStruct((1, n_out), jnp.float32),   # db3
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, act_kind=act_kind, n_valid=N,
                          tile=tile),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, tile, 2), lambda b, t: (b, t, 0)),
            pl.BlockSpec((B, H), lambda b, t: (0, 0)),
            pl.BlockSpec((2, F), lambda b, t: (0, 0)),
            pl.BlockSpec((1, F), lambda b, t: (0, 0)),
            pl.BlockSpec((F, H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, n_out), lambda b, t: (0, 0)),
            pl.BlockSpec((1, tile, n_out), lambda b, t: (b, t, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, 2), lambda b, t: (b, t, 0)),
            pl.BlockSpec((B, H), lambda b, t: (0, 0)),
            pl.BlockSpec((F, H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, H), lambda b, t: (0, 0)),
            pl.BlockSpec((1, H), lambda b, t: (0, 0)),
            pl.BlockSpec((H, n_out), lambda b, t: (0, 0)),
            pl.BlockSpec((1, n_out), lambda b, t: (0, 0)),
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(x, hz, wf, bf.reshape(1, F), w1.astype(jnp.bfloat16), b1.reshape(1, H),
      w2.astype(jnp.bfloat16), b2.reshape(1, H), w3.astype(jnp.bfloat16), g)

    dx, dhz, dw1, db1, dw2, db2, dw3, db3 = outs
    return (dx, dhz, None, None, dw1, db1.reshape(H), dw2, db2.reshape(H),
            dw3, db3.reshape(n_out))


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused(act_kind, tile, interpret, x, hz, wf, bf, w1, b1, w2, b2, w3, b3):
    return _fwd(x, hz, wf, bf, w1, b1, w2, b2, w3, b3, act_kind=act_kind,
                tile=tile, interpret=interpret)


def _vjp_fwd(act_kind, tile, interpret, x, hz, wf, bf, w1, b1, w2, b2, w3, b3):
    y = _fwd(x, hz, wf, bf, w1, b1, w2, b2, w3, b3, act_kind=act_kind,
             tile=tile, interpret=interpret)
    return y, (x, hz, wf, bf, w1, b1, w2, b2, w3, b3)


def _vjp_bwd(act_kind, tile, interpret, res, g):
    return _bwd(res, g, act_kind=act_kind, tile=tile, interpret=interpret)


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def fused_decoder_mlp(x, hz, wf, bf, w1, b1, w2, b2, w3, b3,
                      act_kind: str = "leakyrelu", tile: int = 256,
                      interpret: bool = False):
    """y = W3 act(W2 act(W1 cos(x@wf + bf) + b1 + hz) + b2) + b3.

    x: (B, N, 2); hz: (B, H); wf: (2, F) ALREADY divided by sigma.
    Returns (B, N, n_out) f32. Differentiable w.r.t. everything except
    (wf, bf), which are non-trainable buffers.
    """
    return _fused(act_kind, tile, interpret, x, hz, wf, bf, w1, b1, w2, b2,
                  w3, b3)
