"""Fused joint-posterior kernel (mode C): softmax + Gumbel sample + moments +
KL in one pass.

This is the "single fused softmax-attention kernel producing (q_t_r, sample,
E[z_mu], E[z_std], E[theta])" of the design brief: given the encoder head
outputs over the R x H' x W' grid, one grid program per image computes, fully
in VMEM and f32,

  q        = log_softmax(attn)                       (joint posterior)
  a        = softmax(attn + Gumbel noise)            (reparameterized sample)
  E_a[z_mu], E_a[z_std], E_a[theta_mu], E_a[theta_std]
  dx       = E_{a marginalized over R}[grid coordinate]
  kl       = sum e^q (q - log p(t,r))
           + sum e^q (KL(q(theta|t,r) || N(offset_r, sig_r))
                      + sum_d KL(q(z_d|t,r) || N(0,1)))      [where-guarded]

exactly matching losses/elbo.py mode C (reference train_mnist.py:187-282).
Only per-image scalars leave the chip. The backward pass recomputes the
forward (same PRNG seed) and applies hand-derived VJPs; layout is (B, R, M)
with M = H'*W' on the lane axis, so nothing is ever reshaped across tiled
dims.

Grid programs process G images each (G = largest batch divisor whose blocks
fit a VMEM budget): per-image (R, M) planes are small (49 KB at the flagship
grid), so a one-image-per-program grid is dominated by per-step dispatch/DMA
latency, not compute — batching images per program amortizes it. Seeds stay
per-image (seed + image index), so results are G-invariant.

Gumbel noise comes from the in-kernel PRNG (pltpu.prng_*); pass
deterministic=True to replace the sample with softmax(attn) — used by the
parity tests and mirroring how the ELBO tests zero the reference's noise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _uniform_from_bits(shape):
    bits = pltpu.prng_random_bits(shape)
    bits = pltpu.bitcast(bits, jnp.uint32)
    # top 23 bits -> mantissa of [1, 2), subtract 1 -> [0, 1)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _gumbel(shape):
    u = _uniform_from_bits(shape)
    u = jnp.clip(u, 1e-20, 1.0 - 1e-7)
    return -jnp.log(-jnp.log(u))


def _posterior_core(attn, th_mu, th_ls, z_mu, z_ls, p_tr, gridx, gridy,
                    offs, *, sig_r, zd, deterministic, seed_val):
    """Shared fwd computation on loaded values. attn/th/p_tr: (R, M);
    z_mu/z_ls: (zd, R, M) accessed per-d; grid: (1, M); offs: (R, 1)."""
    m = jnp.max(attn)
    sh = attn - m
    e = jnp.exp(sh)
    s = jnp.sum(e)
    q = sh - jnp.log(s)
    eq = e / s                                        # exp(q)

    if deterministic:
        a = eq
    else:
        pltpu.prng_seed(seed_val)
        a = attn + _gumbel(attn.shape)
        am = jnp.max(a)
        ae = jnp.exp(a - am)
        a = ae / jnp.sum(ae)

    a_locs = jnp.sum(a, axis=0, keepdims=True)        # (1, M)
    dx0 = jnp.sum(a_locs * gridx)
    dx1 = jnp.sum(a_locs * gridy)

    th_std = jnp.exp(th_ls) + _EPS
    th_mu_e = jnp.sum(a * th_mu)
    th_std_e = jnp.sum(a * th_std)

    dead = eq == 0.0
    tq_mu = jnp.where(dead, 0.0, th_mu)
    tq_std = jnp.where(dead, 1.0, th_std)
    # KL(N(mu, std) || N(offs, sig_r))
    kl_th = (jnp.log(sig_r / tq_std)
             + (tq_std * tq_std + (tq_mu - offs) ** 2) / (2.0 * sig_r * sig_r)
             - 0.5)

    val1 = jnp.sum(eq * (q - p_tr))

    z_mu_e = []
    z_std_e = []
    kl_z = jnp.zeros_like(attn)
    for d in range(zd):
        zm = z_mu[d]
        zs = jnp.exp(z_ls[d]) + _EPS
        z_mu_e.append(jnp.sum(a * zm))
        z_std_e.append(jnp.sum(a * zs))
        zq_mu = jnp.where(dead, 0.0, zm)
        zq_std = jnp.where(dead, 1.0, zs)
        kl_z = kl_z + (-jnp.log(zq_std)
                       + 0.5 * (zq_std * zq_std + zq_mu * zq_mu) - 0.5)

    val2 = jnp.sum(eq * (kl_th + kl_z))
    kl = val1 + val2
    return q, eq, a, dead, th_std, kl_th, kl_z, z_mu_e, z_std_e, \
        th_mu_e, th_std_e, dx0, dx1, kl


def _fwd_kernel(seed_ref, attn_ref, th_ref, z_ref, p_tr_ref, gx_ref, gy_ref,
                offs_ref, out_ref, *, sig_r, zd, deterministic, G):
    b = pl.program_id(0)
    for g in range(G):
        attn = attn_ref[g]
        (q, eq, a, dead, th_std, kl_th, kl_z, z_mu_e, z_std_e, th_mu_e,
         th_std_e, dx0, dx1, kl) = _posterior_core(
            attn, th_ref[g, 0], th_ref[g, 1], z_ref[g, 0], z_ref[g, 1],
            p_tr_ref[...], gx_ref[...], gy_ref[...], offs_ref[...],
            sig_r=sig_r, zd=zd, deterministic=deterministic,
            seed_val=seed_ref[0] + b * G + g)
        vals = z_mu_e + z_std_e + [th_mu_e, th_std_e, dx0, dx1, kl]
        out_ref[g] = jnp.concatenate([v.reshape(1, 1) for v in vals], axis=1)


def _bwd_kernel(seed_ref, attn_ref, th_ref, z_ref, p_tr_ref, gx_ref, gy_ref,
                offs_ref, g_ref, dattn_ref, dth_ref, dz_ref, *, sig_r, zd,
                deterministic, G):
    b = pl.program_id(0)
    for gi in range(G):
        _bwd_one(gi, seed_ref[0] + b * G + gi, attn_ref, th_ref, z_ref,
                 p_tr_ref, gx_ref, gy_ref, offs_ref, g_ref, dattn_ref,
                 dth_ref, dz_ref, sig_r=sig_r, zd=zd,
                 deterministic=deterministic)


def _bwd_one(gi, seed_val, attn_ref, th_ref, z_ref, p_tr_ref, gx_ref, gy_ref,
             offs_ref, g_ref, dattn_ref, dth_ref, dz_ref, *, sig_r, zd,
             deterministic):
    attn = attn_ref[gi]
    th_mu = th_ref[gi, 0]
    th_ls = th_ref[gi, 1]
    (q, eq, a, dead, th_std, kl_th, kl_z, z_mu_e, z_std_e, th_mu_e, th_std_e,
     dx0, dx1, kl) = _posterior_core(
        attn, th_mu, th_ls, z_ref[gi, 0], z_ref[gi, 1],
        p_tr_ref[...], gx_ref[...], gy_ref[...], offs_ref[...],
        sig_r=sig_r, zd=zd, deterministic=deterministic,
        seed_val=seed_val)

    g = g_ref[gi]                                    # (1, 2*zd + 5) cotangents
    g_zmu = [g[0, d] for d in range(zd)]
    g_zstd = [g[0, zd + d] for d in range(zd)]
    g_thmu = g[0, 2 * zd]
    g_thstd = g[0, 2 * zd + 1]
    g_dx0 = g[0, 2 * zd + 2]
    g_dx1 = g[0, 2 * zd + 3]
    g_kl = g[0, 2 * zd + 4]

    gridx = gx_ref[...]
    gridy = gy_ref[...]
    offs = offs_ref[...]
    p_tr = p_tr_ref[...]

    # --- grads into the sample a ---
    d_a = g_thmu * th_mu + g_thstd * th_std
    d_a = d_a + (g_dx0 * gridx + g_dx1 * gridy)      # broadcast (1,M)->(R,M)
    for d in range(zd):
        zs = jnp.exp(z_ref[gi, 1, d]) + _EPS
        d_a = d_a + g_zmu[d] * z_ref[gi, 0, d] + g_zstd[d] * zs

    # --- grads into q via the KL ---
    # val1: d/dq_i = e^q (q - p) + e^q ; val2: d/dq_i = e^q * w_i
    w = kl_th + kl_z
    d_q = g_kl * eq * ((q - p_tr) + 1.0 + w)

    # --- grads into the per-cell moments via the guarded KLs ---
    scale = g_kl * eq
    live = jnp.logical_not(dead)
    # theta: mu -> (mu - offs)/sig^2 ; std -> std/sig^2 - 1/std, then exp chain
    d_thmu = g_thmu * a + jnp.where(
        live, scale * (th_mu - offs) / (sig_r * sig_r), 0.0)
    d_thstd = g_thstd * a + jnp.where(
        live, scale * (th_std / (sig_r * sig_r) - 1.0 / th_std), 0.0)
    d_thls = d_thstd * (th_std - _EPS)               # d exp(ls)
    dth_ref[gi, 0] = d_thmu
    dth_ref[gi, 1] = d_thls

    for d in range(zd):
        zm = z_ref[gi, 0, d]
        zs = jnp.exp(z_ref[gi, 1, d]) + _EPS
        d_zm = g_zmu[d] * a + jnp.where(live, scale * zm, 0.0)
        d_zs = g_zstd[d] * a + jnp.where(live, scale * (zs - 1.0 / zs), 0.0)
        dz_ref[gi, 0, d] = d_zm
        dz_ref[gi, 1, d] = d_zs * (zs - _EPS)

    # --- softmax / log_softmax vjps into attn ---
    # a = softmax(attn + gumbel): d_attn += a * (d_a - sum(d_a * a))
    d_attn = a * (d_a - jnp.sum(d_a * a))
    # q = log_softmax(attn): d_attn += d_q - exp(q) * sum(d_q)
    d_attn = d_attn + d_q - eq * jnp.sum(d_q)
    dattn_ref[gi] = d_attn


def _pick_group(B: int, R: int, M: int, zd: int, want_grads: bool) -> int:
    """Largest batch divisor G whose per-program blocks stay under a ~5 MB
    VMEM budget (x2 for Mosaic's double buffering -> ~10 MB of the 16 MB
    scoped default). Per image the bwd touches (3 + 2*zd) input planes plus
    as many output planes of padded (R, M) f32."""
    plane = (-(-R // 8) * 8) * (-(-M // 128) * 128) * 4
    planes = (3 + 2 * zd) * (2 if want_grads else 1)
    budget = 5 * 1024 * 1024
    for G in range(min(B, max(1, budget // max(1, planes * plane))), 0, -1):
        if B % G == 0:
            return G
    return 1


def _call(seed, attn, th, z, p_tr, gx, gy, offs, *, sig_r, zd, deterministic,
          interpret, want_grads, g=None):
    B, R, M = attn.shape
    n_out = 2 * zd + 5
    G = _pick_group(B, R, M, zd, want_grads)
    common_in = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # seed (1,)
        pl.BlockSpec((G, R, M), lambda b: (b, 0, 0)),          # attn
        pl.BlockSpec((G, 2, R, M), lambda b: (b, 0, 0, 0)),    # theta mu/ls
        pl.BlockSpec((G, 2, zd, R, M), lambda b: (b, 0, 0, 0, 0)),  # z
        pl.BlockSpec((R, M), lambda b: (0, 0)),                # p_tr
        pl.BlockSpec((1, M), lambda b: (0, 0)),                # grid x
        pl.BlockSpec((1, M), lambda b: (0, 0)),                # grid y
        pl.BlockSpec((R, 1), lambda b: (0, 0)),                # offsets
    ]
    if not want_grads:
        return pl.pallas_call(
            functools.partial(_fwd_kernel, sig_r=sig_r, zd=zd,
                              deterministic=deterministic, G=G),
            grid=(B // G,),
            in_specs=common_in,
            out_specs=pl.BlockSpec((G, 1, n_out), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 1, n_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(seed, attn, th, z, p_tr, gx, gy, offs)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, sig_r=sig_r, zd=zd,
                          deterministic=deterministic, G=G),
        grid=(B // G,),
        in_specs=common_in + [
            pl.BlockSpec((G, 1, n_out), lambda b: (b, 0, 0)),  # cotangents
        ],
        out_specs=(
            pl.BlockSpec((G, R, M), lambda b: (b, 0, 0)),
            pl.BlockSpec((G, 2, R, M), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((G, 2, zd, R, M), lambda b: (b, 0, 0, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, M), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, R, M), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, zd, R, M), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, attn, th, z, p_tr, gx, gy, offs, g)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused(sig_r, zd, deterministic, interpret, seed, attn, th, z, p_tr, gx,
           gy, offs):
    return _call(seed, attn, th, z, p_tr, gx, gy, offs, sig_r=sig_r, zd=zd,
                 deterministic=deterministic, interpret=interpret,
                 want_grads=False)


def _vjp_fwd(sig_r, zd, deterministic, interpret, seed, attn, th, z, p_tr,
             gx, gy, offs):
    out = _call(seed, attn, th, z, p_tr, gx, gy, offs, sig_r=sig_r, zd=zd,
                deterministic=deterministic, interpret=interpret,
                want_grads=False)
    return out, (seed, attn, th, z, p_tr, gx, gy, offs)


def _vjp_bwd(sig_r, zd, deterministic, interpret, res, g):
    seed, attn, th, z, p_tr, gx, gy, offs = res
    d_attn, d_th, d_z = _call(
        seed, attn, th, z, p_tr, gx, gy, offs, sig_r=sig_r, zd=zd,
        deterministic=deterministic, interpret=interpret, want_grads=True,
        g=g)
    return (None, d_attn, d_th, d_z, None, None, None, None)


_fused.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# grid-sharded (SP) variant: per-shard partials with global normalizers
# ---------------------------------------------------------------------------
# Each device runs these kernels on its LOCAL cell shard of the joint grid;
# the caller (parallel/grid_softmax.sp_posterior_kernel) supplies the global
# softmax normalizers (cross-device max + log-sum-exp over 'model') and psums
# the emitted partial sums — the "Pallas blockwise softmax" composition of
# SURVEY.md section 5 for the op at reference src/models.py:383-387. Inputs
# are flat cell shards (B, C) viewed as (B, C//128, 128); p/grid/offs are
# PER-CELL (offsets vary along the r-minor flatten), unlike the unsharded
# kernel's (R, M) layout. Padded cells carry -1e30 logits: exp underflows to
# exactly 0, the dead-cell guards neutralize their moments, and every partial
# they contribute is 0 * finite = 0 (losses/elbo.py padding contract).


def _sp_fwd_kernel(norm_ref, attn_ref, noise_ref, th_ref, z_ref, p_ref,
                   gx_ref, gy_ref, offs_ref, out_ref, *, sig_r, zd):
    attn = attn_ref[0]                                 # (S, 128) f32
    q = attn - norm_ref[0, 0] - norm_ref[0, 1]         # log q, globally normed
    eq = jnp.exp(q)
    a = jnp.exp(attn + noise_ref[0] - norm_ref[0, 2] - norm_ref[0, 3])

    gx = gx_ref[...]
    gy = gy_ref[...]
    offs = offs_ref[...]
    dx0 = jnp.sum(a * gx)
    dx1 = jnp.sum(a * gy)

    th_mu = th_ref[0, 0]
    th_std = jnp.exp(th_ref[0, 1]) + _EPS
    th_mu_e = jnp.sum(a * th_mu)
    th_std_e = jnp.sum(a * th_std)

    dead = eq == 0.0
    tq_mu = jnp.where(dead, 0.0, th_mu)
    tq_std = jnp.where(dead, 1.0, th_std)
    kl_th = (jnp.log(sig_r / tq_std)
             + (tq_std * tq_std + (tq_mu - offs) ** 2) / (2.0 * sig_r * sig_r)
             - 0.5)
    val1 = jnp.sum(eq * (q - p_ref[...]))

    z_mu_e = []
    z_std_e = []
    kl_z = jnp.zeros_like(attn)
    for d in range(zd):
        zm = z_ref[0, 0, d]
        zs = jnp.exp(z_ref[0, 1, d]) + _EPS
        z_mu_e.append(jnp.sum(a * zm))
        z_std_e.append(jnp.sum(a * zs))
        zq_mu = jnp.where(dead, 0.0, zm)
        zq_std = jnp.where(dead, 1.0, zs)
        kl_z = kl_z + (-jnp.log(zq_std)
                       + 0.5 * (zq_std * zq_std + zq_mu * zq_mu) - 0.5)

    kl = val1 + jnp.sum(eq * (kl_th + kl_z))
    vals = z_mu_e + z_std_e + [th_mu_e, th_std_e, dx0, dx1, kl]
    out_ref[0] = jnp.concatenate([v.reshape(1, 1) for v in vals], axis=1)


def _sp_bwd_kernel(norm_ref, attn_ref, noise_ref, th_ref, z_ref, p_ref,
                   gx_ref, gy_ref, offs_ref, g_ref,
                   da_ref, dq_ref, dth_ref, dz_ref, sp_ref, *, sig_r, zd):
    """Phase 1 of the SP backward: everything except the softmax vjps, whose
    cross-shard sums S1 = sum(d_a * a), S2 = sum(d_q) the caller psums; the
    final d_attn = a*(d_a - S1) + d_q - eq*S2 is elementwise XLA."""
    attn = attn_ref[0]
    q = attn - norm_ref[0, 0] - norm_ref[0, 1]
    eq = jnp.exp(q)
    a = jnp.exp(attn + noise_ref[0] - norm_ref[0, 2] - norm_ref[0, 3])
    th_mu = th_ref[0, 0]
    th_std = jnp.exp(th_ref[0, 1]) + _EPS
    offs = offs_ref[...]

    g = g_ref[0]                                       # (1, 2zd+5)
    g_zmu = [g[0, d] for d in range(zd)]
    g_zstd = [g[0, zd + d] for d in range(zd)]
    g_thmu = g[0, 2 * zd]
    g_thstd = g[0, 2 * zd + 1]
    g_dx0 = g[0, 2 * zd + 2]
    g_dx1 = g[0, 2 * zd + 3]
    g_kl = g[0, 2 * zd + 4]

    dead = eq == 0.0
    live = jnp.logical_not(dead)
    tq_mu = jnp.where(dead, 0.0, th_mu)
    tq_std = jnp.where(dead, 1.0, th_std)
    kl_th = (jnp.log(sig_r / tq_std)
             + (tq_std * tq_std + (tq_mu - offs) ** 2) / (2.0 * sig_r * sig_r)
             - 0.5)

    # grads into the sample a (local cells)
    d_a = (g_thmu * th_mu + g_thstd * th_std
           + g_dx0 * gx_ref[...] + g_dx1 * gy_ref[...])
    kl_z = jnp.zeros_like(attn)
    for d in range(zd):
        zm = z_ref[0, 0, d]
        zs = jnp.exp(z_ref[0, 1, d]) + _EPS
        d_a = d_a + g_zmu[d] * zm + g_zstd[d] * zs
        zq_mu = jnp.where(dead, 0.0, zm)
        zq_std = jnp.where(dead, 1.0, zs)
        kl_z = kl_z + (-jnp.log(zq_std)
                       + 0.5 * (zq_std * zq_std + zq_mu * zq_mu) - 0.5)

    w = kl_th + kl_z
    d_q = g_kl * eq * ((q - p_ref[...]) + 1.0 + w)

    scale = g_kl * eq
    d_thmu = g_thmu * a + jnp.where(
        live, scale * (th_mu - offs) / (sig_r * sig_r), 0.0)
    d_thstd = g_thstd * a + jnp.where(
        live, scale * (th_std / (sig_r * sig_r) - 1.0 / th_std), 0.0)
    dth_ref[0, 0] = d_thmu
    dth_ref[0, 1] = d_thstd * (th_std - _EPS)          # d exp(ls)
    for d in range(zd):
        zm = z_ref[0, 0, d]
        zs = jnp.exp(z_ref[0, 1, d]) + _EPS
        dz_ref[0, 0, d] = g_zmu[d] * a + jnp.where(live, scale * zm, 0.0)
        d_zs = g_zstd[d] * a + jnp.where(live, scale * (zs - 1.0 / zs), 0.0)
        dz_ref[0, 1, d] = d_zs * (zs - _EPS)

    da_ref[0] = d_a
    dq_ref[0] = d_q
    sp_ref[0] = jnp.concatenate(
        [jnp.sum(d_a * a).reshape(1, 1), jnp.sum(d_q).reshape(1, 1)], axis=1)


def posterior_shard_partials(norms, attn, noise, th, z, p, gx, gy, offs, *,
                             sig_r, zd, interpret=False,
                             want_grads=False, g=None):
    """Raw per-shard posterior kernels (no custom VJP — the VJP lives at the
    collective level, parallel/grid_softmax.sp_posterior_kernel).

    norms (B, 4): [gmax_q, g_logsum_q, gmax_a, g_logsum_a] global softmax
    normalizers per image. attn/noise (B, C); th (B, 2, C); z (B, 2, zd, C);
    p/gx/gy/offs (C,) per-cell constants of the LOCAL shard (p globally
    log-softmaxed). C must be a multiple of 1024.

    Forward: (B, 2zd+5) local partial sums (psum to finish).
    Backward (want_grads=True, g (B, 2zd+5) TOTAL cotangent): returns
    (d_a, d_q, d_th, d_z, spart) where spart (B, 2) holds the local
    [sum(d_a*a), sum(d_q)] softmax-vjp partials.
    """
    B, C = attn.shape
    assert C % 1024 == 0, C
    S = C // 128
    n_out = 2 * zd + 5
    view = lambda v: v.reshape(*v.shape[:-1], S, 128)
    common_in = [
        pl.BlockSpec((1, 4), lambda b: (b, 0)),                  # norms
        pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0)),          # attn
        pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0)),          # noise
        pl.BlockSpec((1, 2, S, 128), lambda b: (b, 0, 0, 0)),    # theta
        pl.BlockSpec((1, 2, zd, S, 128), lambda b: (b, 0, 0, 0, 0)),  # z
        pl.BlockSpec((S, 128), lambda b: (0, 0)),                # p
        pl.BlockSpec((S, 128), lambda b: (0, 0)),                # grid x
        pl.BlockSpec((S, 128), lambda b: (0, 0)),                # grid y
        pl.BlockSpec((S, 128), lambda b: (0, 0)),                # offsets
    ]
    args = (norms, view(attn), view(noise), view(th), view(z), view(p),
            view(gx), view(gy), view(offs))
    if not want_grads:
        out = pl.pallas_call(
            functools.partial(_sp_fwd_kernel, sig_r=sig_r, zd=zd),
            grid=(B,),
            in_specs=common_in,
            out_specs=pl.BlockSpec((1, 1, n_out), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 1, n_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(*args)
        return out[:, 0]
    da, dq, dth, dz, spart = pl.pallas_call(
        functools.partial(_sp_bwd_kernel, sig_r=sig_r, zd=zd),
        grid=(B,),
        in_specs=common_in + [
            pl.BlockSpec((1, 1, n_out), lambda b: (b, 0, 0)),    # cotangent
        ],
        out_specs=(
            pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 2, S, 128), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 2, zd, S, 128), lambda b: (b, 0, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, S, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, S, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, zd, S, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 2), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args, g.reshape(B, 1, n_out))
    return (da.reshape(B, C), dq.reshape(B, C), dth.reshape(B, 2, C),
            dz.reshape(B, 2, zd, C), spart[:, 0])


def fused_posterior(key, attn, theta_mu, theta_logstd, z_mu, z_logstd,
                    p_tr, grid, offsets, sig_r, *, deterministic=False,
                    interpret=False):
    """Fused mode-C posterior.

    attn: (B, R, M) logits incl. log p(r); theta_*: (B, R, M) (mu incl.
    offsets); z_*: (B, zd, R, M); p_tr: (R, M) log p(t, r); grid: (M, 2);
    offsets: (R,); sig_r: conditional prior std.

    Returns dict with z_mu_e/z_std_e (B, zd), theta_mu_e/theta_std_e (B,),
    dx (B, 2), kl (B,). Differentiable in attn/theta/z.
    """
    B, R, M = attn.shape
    zd = z_mu.shape[1]
    seed = jnp.asarray(
        jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max),
        jnp.int32)
    th = jnp.stack([theta_mu, theta_logstd], axis=1)        # (B, 2, R, M)
    z = jnp.stack([z_mu, z_logstd], axis=1)                 # (B, 2, zd, R, M)
    gx = grid[:, 0].reshape(1, M)
    gy = grid[:, 1].reshape(1, M)
    offs = offsets.reshape(R, 1)
    out = _fused(float(sig_r), zd, deterministic, interpret, seed,
                 attn.astype(jnp.float32), th.astype(jnp.float32),
                 z.astype(jnp.float32), p_tr.astype(jnp.float32),
                 gx.astype(jnp.float32), gy.astype(jnp.float32),
                 offs.astype(jnp.float32))
    out = out[:, 0]                                          # (B, 2zd+5)
    return {
        "z_mu_e": out[:, :zd],
        "z_std_e": out[:, zd:2 * zd],
        "theta_mu_e": out[:, 2 * zd],
        "theta_std_e": out[:, 2 * zd + 1],
        "dx": out[:, 2 * zd + 2:2 * zd + 4],
        "kl": out[:, 2 * zd + 4],
    }
