#!/usr/bin/env python
"""Microbench of fused_lift_act_mix_heads fwd / fwd+bwd at EMPIAR scale,
sweeping the rotation-group parameter. Grads reduce to a scalar ON DEVICE
(see BENCH_NOTES measurement gotcha)."""

import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from targetvae_tpu.kernels.mix_heads import fused_lift_act_mix_heads


def bench(G, R=8, K=128, D=7, N=312208):
    # N matches the in-step EMPIAR value AFTER the lift batch pad
    # (models/encoders.py::_lift_batch_pad): 312208 = 494 x 632, an 8-aligned
    # tile divisor — the unpadded 312050 forces T=395 and re-tiles h1/dpre1.
    ks = jax.random.split(jax.random.key(0), 6)
    pre1 = (jax.random.normal(ks[0], (N, R * K)) * 0.5).astype(jnp.bfloat16)
    bc = jax.random.normal(ks[1], (R * K,)) * 0.1
    w2 = jax.random.normal(ks[2], (K, K)) * 0.05
    b2 = jax.random.normal(ks[3], (K,)) * 0.1
    wh = jax.random.normal(ks[4], (K, D)) * 0.05
    bh = jax.random.normal(ks[5], (D,)) * 0.1

    @jax.jit
    def fwd(pre1, bc, w2, b2, wh, bh):
        out = fused_lift_act_mix_heads(pre1, bc, w2, b2, wh, bh, R=R, K=K,
                                       group=G)
        return jnp.sum(out)

    @jax.jit
    def both(pre1, bc, w2, b2, wh, bh):
        def loss(args):
            out = fused_lift_act_mix_heads(*args, R=R, K=K, group=G)
            return jnp.sum(out * out)
        val, grads = jax.value_and_grad(loss)((pre1, bc, w2, b2, wh, bh))
        return val + sum(jnp.sum(g.astype(jnp.float32)) for g in
                         jax.tree.leaves(grads))

    def t(f):
        jax.device_get(f(pre1, bc, w2, b2, wh, bh))
        n = 20
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            acc = f(pre1, bc, w2, b2, wh, bh)
        jax.device_get(acc)
        return (time.perf_counter() - t0) / n * 1e3

    tf, tb = t(fwd), t(both)
    print(f"G={G}: fwd {tf:6.2f} ms   fwd+bwd {tb:6.2f} ms  "
          f"(bwd ~{tb - tf:6.2f})", flush=True)


if __name__ == "__main__":
    groups = [int(g) for g in sys.argv[1:]] or [1, 2, 4, 8]
    for G in groups:
        bench(G)
