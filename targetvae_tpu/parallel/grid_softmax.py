"""Grid-sharded joint posterior: the sequence-parallel analog for TARGET-VAE.

The model's "long axis" is the joint R x H' x W' posterior grid (up to
16 x 65 x 65 ~ 68k cells) over which a log-softmax, a Gumbel draw, and
attention-weighted moment reductions run (SURVEY.md section 5; the op the
reference does at src/models.py:383-387 plus the moment/KL assembly at
train_mnist.py:203-281). For grids too large for one chip (or to scale
batch x grid throughput), these ops shard the cell axis across devices
inside shard_map: a cross-device log-sum-exp (pmax + psum — the
ring-attention-shaped pattern) normalizes the posterior, and the weighted
moments psum their partial sums. Communication is O(B) per reduction,
independent of grid size.

`make_joint_posterior` is the training-path entry point: the complete
mode-B/C posterior block (softmax + Gumbel + expected moments + dx + KL)
with the cell axis sharded over the mesh's 'model' axis and the batch axis
left on 'data'. compute_elbo calls it when the Trainer enables SP
(TrainConfig.sp / the --sp CLI flag).

Communication bill (measured from compiled HLO,
tests/test_parallel.py::test_sp_collective_bytes_scale_inverse_with_model_axis):
the kernel-SP tier's per-device traffic per step is

    all_to_all:  2 * (3 + 2*z_dim) * 4 * B * cells_p / (dp * T)  bytes
    all_reduce:  O(params + B)  (grad psums + the LSE/moment partials)

where T = the 'model' axis size, cells_p = cells rounded up to T*1024, f32
elements, and the leading 2 is forward + backward (an all_to_all's VJP is
the inverse all_to_all). Nothing communicates at the O(B * cells)
replicated-grid scale.

When to use --sp: the exchange pays for itself once a device's share of
the posterior inputs stops fitting alongside the lift activations, or once
the posterior's VPU time dominates the step — in practice grids of ~16k+
cells (P12+ at 65x65, i.e. k >= 64 attention maps with groupconv >= 12) at
EMPIAR batch sizes. Below that the all_to_all latency (~10 us/hop on ICI)
buys nothing: the whole grid already fits per-device, so prefer plain
DP/TP. The volume formula above gives the exact bytes to weigh against the
~4.5e10 B/s per-ICI-link budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 top-level API
    from jax import shard_map as _shard_map
    _SM_KW = {"check_vma": False}
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map
    _SM_KW = {"check_rep": False}


def sharded_log_softmax(logits: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """log_softmax over the last axis, which is sharded across `axis_name`.

    logits: (B, cells_local) inside shard_map. Returns local q shard with
    global normalization: logsumexp over ALL devices' cells.
    """
    local_max = jnp.max(logits, axis=-1, keepdims=True)
    # pmax has no differentiation rule; the max is only a numerical shift, so
    # stop_gradient is exact here
    gmax = jax.lax.pmax(jax.lax.stop_gradient(local_max), axis_name)
    local_sum = jnp.sum(jnp.exp(logits - gmax), axis=-1, keepdims=True)
    gsum = jax.lax.psum(local_sum, axis_name)
    return logits - (jnp.log(gsum) + gmax)


def sharded_gumbel_softmax(key: jax.Array, logits: jnp.ndarray,
                           axis_name: str) -> jnp.ndarray:
    """Gumbel-softmax over the sharded cell axis. Each device draws its own
    Gumbel noise from a per-shard fold of the key; the softmax normalizer is
    the cross-device LSE."""
    idx = jax.lax.axis_index(axis_name)
    noise = jax.random.gumbel(jax.random.fold_in(key, idx), logits.shape,
                              dtype=logits.dtype)
    return jnp.exp(sharded_log_softmax(logits + noise, axis_name))


def sharded_weighted_moments(weights: jnp.ndarray, values: jnp.ndarray,
                             axis_name: str) -> jnp.ndarray:
    """E_w[v] over the sharded cell axis.

    weights: (B, cells_local); values: (B, cells_local, D) -> (B, D), psum'd.
    """
    partial = jnp.einsum("bm,bmd->bd", weights, values)
    return jax.lax.psum(partial, axis_name)


def make_sharded_posterior(mesh: Mesh, axis: str = "model"):
    """Returns fn(attn_flat (B, M), key, z (B, M, D)) -> (q, a_sampled, E[z])
    computed with the cell axis sharded over `axis` of `mesh`."""

    def inner(attn, key, z):
        q = sharded_log_softmax(attn, axis)
        a = sharded_gumbel_softmax(key, attn, axis)
        ez = sharded_weighted_moments(a, z, axis)
        return q, a, ez

    return _shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, axis), P(), P(None, axis, None)),
        out_specs=(P(None, axis), P(None, axis), P()),
        **_SM_KW)


# ---------------------------------------------------------------------------
# full posterior block for the training path
# ---------------------------------------------------------------------------

def _posterior_block(axis, eps, sig_r,
                     attn, noise, th_mu, th_logstd, z_mu, z_logstd,
                     log_prior, grid_cells, offs_cells):
    """Runs per-shard inside shard_map. All cell axes are local shards;
    reductions over cells psum across `axis`. Mirrors the unsharded mode-C
    assembly in losses/elbo.py (match point: train_mnist.py:187-282)."""
    q = sharded_log_softmax(attn, axis)                         # (B, mc)
    # Gumbel-softmax with pre-drawn noise (drawn ONCE for the full grid by
    # the caller, so sharded and unsharded runs sample identically)
    a = jnp.exp(sharded_log_softmax(attn + noise, axis))        # (B, mc)

    z_std = jnp.exp(z_logstd) + eps
    th_std = jnp.exp(th_logstd) + eps

    z_mu_e = sharded_weighted_moments(a, z_mu, axis)            # (B, zd)
    z_std_e = sharded_weighted_moments(a, z_std, axis)
    th_mu_e = jax.lax.psum(jnp.einsum("bm,bm->b", th_mu, a), axis)
    th_std_e = jax.lax.psum(jnp.einsum("bm,bm->b", th_std, a), axis)
    dx = jax.lax.psum(jnp.einsum("mj,bm->bj", grid_cells, a), axis)

    # KL: discrete joint KL + expected conditional KLs, NaN-guarded like the
    # reference's torch.where (ops/kl.guarded_moments)
    from ..ops.kl import guarded_moments, normal_kl
    p_cells = sharded_log_softmax(log_prior[None, :], axis)[0]  # (mc,)
    val1 = jax.lax.psum(jnp.sum(jnp.exp(q) * (q - p_cells), axis=1), axis)

    zg_mu, zg_std = guarded_moments(q[..., None], z_mu, z_std)
    tg_mu, tg_std = guarded_moments(q, th_mu, th_std)
    kl_z = jnp.sum(normal_kl(zg_mu, zg_std, 0.0, 1.0), axis=-1)
    kl_th = normal_kl(tg_mu, tg_std, offs_cells, sig_r)
    val2 = jax.lax.psum(jnp.sum(jnp.exp(q) * (kl_th + kl_z), axis=1), axis)

    return z_mu_e, z_std_e, th_mu_e, th_std_e, dx, val1 + val2


# ---------------------------------------------------------------------------
# Pallas-composed SP posterior: per-shard kernel + cross-device LSE/psum
# ---------------------------------------------------------------------------

def _global_norms(logits: jnp.ndarray, axis: str):
    """(gmax, g_log_sum) per image for a softmax whose cell axis is sharded
    over `axis`. The pmax'd max is only a numerical shift (stop_gradient is
    exact); the log-sum uses the cross-device psum — together the LSE of
    sharded_log_softmax, exposed as per-image scalars for the kernel."""
    lm = jnp.max(logits, axis=1, keepdims=True)
    gmax = jax.lax.pmax(jax.lax.stop_gradient(lm), axis)
    gsum = jax.lax.psum(
        jnp.sum(jnp.exp(logits - gmax), axis=1, keepdims=True), axis)
    return gmax, jnp.log(gsum)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def sp_posterior_kernel(axis, sig_r, zd, interpret,
                        attn, noise, th, z, p, gx, gy, offs):
    """The grid-sharded posterior with the per-shard Pallas kernel.

    Runs INSIDE shard_map with the cell axis sharded over `axis`: each device
    computes its local (B, C_local) shard's partial moments/KL with
    kernels/posterior.posterior_shard_partials, normalized by the
    cross-device LSE and combined by psum — SURVEY section 5's "Pallas
    blockwise softmax" for the op at reference src/models.py:383-387.

    attn/noise (B, C_local) f32 (noise: pre-drawn PER-SHARD Gumbel noise, not
    differentiated); th (B, 2, C); z (B, 2, zd, C); p (C,) globally
    log-softmaxed log-prior shard; gx/gy/offs (C,) per-cell constants.
    C_local must be a multiple of 1024 (callers pad cells with -1e30 logits).

    Returns (B, 2zd+5) [z_mu_e(zd), z_std_e(zd), th_mu_e, th_std_e, dx0, dx1,
    kl], identical on every device of `axis`.
    """
    out, _ = _sp_post_fwd(axis, sig_r, zd, interpret,
                          attn, noise, th, z, p, gx, gy, offs)
    return out


def _sp_post_fwd(axis, sig_r, zd, interpret,
                 attn, noise, th, z, p, gx, gy, offs):
    from ..kernels.posterior import posterior_shard_partials
    mq, lq = _global_norms(attn, axis)
    ma, la = _global_norms(attn + noise, axis)
    norms = jnp.concatenate([mq, lq, ma, la], axis=1)            # (B, 4)
    part = posterior_shard_partials(norms, attn, noise, th, z, p, gx, gy,
                                    offs, sig_r=sig_r, zd=zd,
                                    interpret=interpret)
    out = jax.lax.psum(part, axis)
    return out, (attn, noise, th, z, p, gx, gy, offs, norms)


def _sp_post_bwd(axis, sig_r, zd, interpret, res, g):
    from ..kernels.posterior import posterior_shard_partials
    attn, noise, th, z, p, gx, gy, offs, norms = res
    # out = psum(partials) is consumed locally on every device: the true
    # cotangent of the local partials is the psum of the local cotangents
    g_tot = jax.lax.psum(g, axis)
    da, dq, dth, dz, spart = posterior_shard_partials(
        norms, attn, noise, th, z, p, gx, gy, offs, sig_r=sig_r, zd=zd,
        interpret=interpret, want_grads=True, g=g_tot)
    s = jax.lax.psum(spart, axis)                                # (B, 2)
    # softmax / log_softmax vjps with the GLOBAL sums; a and exp(q) are
    # elementwise recomputes from the saved normalizers
    a = jnp.exp(attn + noise - norms[:, 2:3] - norms[:, 3:4])
    eq = jnp.exp(attn - norms[:, 0:1] - norms[:, 1:2])
    d_attn = a * (da - s[:, 0:1]) + dq - eq * s[:, 1:2]
    zero = jnp.zeros_like
    return (d_attn, zero(noise), dth, dz, zero(p), zero(gx), zero(gy),
            zero(offs))


sp_posterior_kernel.defvjp(_sp_post_fwd, _sp_post_bwd)


def make_joint_posterior(mesh: Mesh, axis: str = "model",
                         data_axis: str = "data",
                         eps: float = 1e-6, sig_r: float = 1.0):
    """The complete attention-posterior block with the joint grid sharded.

    Returns fn(attn, noise, th_mu, th_logstd, z_mu, z_logstd, log_prior,
    grid_cells, offs_cells) -> (z_mu_e, z_std_e, th_mu_e, th_std_e, dx, kl):

      attn       (B, Mc)  prior-added attention logits over ALL joint cells
                          (r-minor flatten of (H', W', R) for mode C; Mc must
                          divide by the 'model' axis size)
      noise      (B, Mc)  standard Gumbel noise for the joint sample
      th_mu/th_logstd (B, Mc); z_mu/z_logstd (B, Mc, zd)
      log_prior  (Mc,)    unnormalized log p(cell) (p_t + p_r); normalized
                          here with the cross-device LSE
      grid_cells (Mc, 2)  translation coordinate of each cell
      offs_cells (Mc,)    conditional prior mean for theta per cell

    The batch axis stays sharded over `data_axis`; every cell reduction is a
    psum over `axis` — O(B) bytes per reduction, grid-size independent.
    """
    block = functools.partial(_posterior_block, axis, eps, sig_r)
    bspec = P(data_axis)
    return _shard_map(
        block, mesh=mesh,
        in_specs=(P(data_axis, axis), P(data_axis, axis),
                  P(data_axis, axis), P(data_axis, axis),
                  P(data_axis, axis, None), P(data_axis, axis, None),
                  P(axis), P(axis, None), P(axis)),
        out_specs=(bspec, bspec, bspec, bspec, bspec, bspec),
        **_SM_KW)
