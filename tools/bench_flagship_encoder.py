#!/usr/bin/env python
"""Decompose the flagship encoder's 6.5 ms (conv1d tier) into its ops.

The round-4 profile puts the conv1d-tier encoder at 6.50 ms fwd+bwd for
0.61 TFLOP (94 TF/s effective) while its two constituents measure far
higher rates in isolation at the EMPIAR shape (lift conv ~165-190 TF/s,
mix_heads ~184 TF/s). This times, at the FLAGSHIP shape (k=28, hp=39,
B=100): the 1-D lift conv fwd / fwd+wgrad, the fused mix_heads kernel
fwd / fwd+bwd, and the rotated-filter-bank build + its backward
(ops/rotate.py) which the encoder pays per step.

Usage: python tools/bench_flagship_encoder.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def _time(label, fn, *args, flops=None, steps=20):
    g = jax.jit(fn)
    t0 = time.time()
    jax.device_get(g(*args))
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        r = g(*args)
    jax.device_get(r)
    dt = (time.time() - t0) / steps
    rate = f" {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{label:22s}: {dt * 1e3:6.2f} ms{rate}  (compile {comp:.0f}s)",
          flush=True)


def main() -> None:
    from targetvae_tpu.models.encoders import (_lift_conv_op,
                                               _lift_batch_pad)
    from targetvae_tpu.kernels.mix_heads import fused_lift_act_mix_heads
    from targetvae_tpu.ops.rotate import rotate_filter_bank

    B, n, k, pad, R, K, C, zd = 100, 50, 28, 8, 8, 128, 1, 2
    hp = n + 2 * pad - k + 1                    # 39
    n2 = n + 2 * pad                            # 66
    cols = B * hp
    padc = _lift_batch_pad(hp, cols)
    N = hp * (cols + padc)
    D = 3 + 2 * zd
    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.standard_normal((cols + padc, C * k, n2)),
                      jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((R * K, C * k, k)), jnp.bfloat16)
    g_out = jnp.asarray(rng.standard_normal((hp, cols + padc, R * K)),
                        jnp.bfloat16)
    lift_flops = 2.0 * hp * (cols + padc) * R * K * C * k * k

    def fwd(lhs, rhs):
        y = _lift_conv_op(lhs, rhs)
        return jax.lax.optimization_barrier(y)[0, 0, 0].astype(jnp.float32)

    def fwd_wgrad(lhs, g_out):
        def f(rhs):
            y = _lift_conv_op(jax.lax.stop_gradient(lhs), rhs)
            return jnp.sum(y.astype(jnp.float32) * g_out.astype(jnp.float32))
        return jnp.sum(jax.grad(f)(rhs).astype(jnp.float32))

    _time("lift fwd", fwd, lhs, rhs, flops=lift_flops)
    _time("lift fwd+wgrad", fwd_wgrad, lhs, g_out, flops=2 * lift_flops)

    pre1 = jnp.asarray(rng.standard_normal((N, R * K)) * 0.5, jnp.bfloat16)
    bc = jnp.asarray(rng.standard_normal((R * K,)) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((K, K)) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((K,)) * 0.1)
    wh = jnp.asarray(rng.standard_normal((K, D)) * 0.1)
    bh = jnp.asarray(rng.standard_normal((D,)) * 0.1)
    mix_flops = 2.0 * N * R * K * (K + D)

    def mix_fwd(pre1, bc, w2, b2, wh, bh):
        out = fused_lift_act_mix_heads(pre1, bc, w2, b2, wh, bh, R=R, K=K)
        return jnp.sum(out)

    def mix_fwdbwd(pre1, bc, w2, b2, wh, bh):
        g = jax.grad(mix_fwd, argnums=(0, 2, 4))(pre1, bc, w2, b2, wh, bh)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

    _time("mix_heads fwd", mix_fwd, pre1, bc, w2, b2, wh, bh,
          flops=mix_flops)
    _time("mix_heads fwd+bwd", mix_fwdbwd, pre1, bc, w2, b2, wh, bh,
          flops=3 * mix_flops)

    w1 = jnp.asarray(rng.standard_normal((K, C, 1, k, k)), jnp.float32)

    def rot_fwd(w1):
        return jnp.sum(rotate_filter_bank(w1, R).astype(jnp.float32))

    def rot_fwdbwd(w1):
        return jnp.sum(jax.grad(lambda w: rot_fwd(w))(w1))

    _time("rotate_bank fwd", rot_fwd, w1)
    _time("rotate_bank fwd+bwd", rot_fwdbwd, w1)


if __name__ == "__main__":
    main()
