"""Grid-sharded joint posterior: the sequence-parallel analog for TARGET-VAE.

The model's "long axis" is the joint R x H' x W' posterior grid (up to
16 x 65 x 65 ~ 68k cells) over which a log-softmax, a Gumbel draw, and
attention-weighted moment reductions run (SURVEY.md section 5). For grids too
large for one chip (or to scale batch x grid throughput), these ops shard the
cell axis across devices inside shard_map: a cross-device log-sum-exp
(pmax + psum — the ring-attention-shaped pattern) normalizes the posterior,
and the weighted moments psum their partial sums. Communication is O(B) per
reduction, independent of grid size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    from jax.experimental.shard_map import shard_map

    def inner(attn, key, z):
        q = sharded_log_softmax(attn, axis)
        a = sharded_gumbel_softmax(key, attn, axis)
        ez = sharded_weighted_moments(a, z, axis)
        return q, a, ez

    return shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, axis), P(), P(None, axis, None)),
        out_specs=(P(None, axis), P(None, axis), P()),
        check_rep=False)
