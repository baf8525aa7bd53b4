#!/usr/bin/env python
"""Isolate the lift conv's WEIGHT-GRAD conv (the deep-reduction GEMM).

The fwd lift conv and its filter cotangent are the two 'convolution fusion'
rows in tools/op_profile.py; this times each alone (fwd: value only with the
output materialized; wgrad: grad wrt rhs with lhs stop-gradiented) so the
slow one can be identified per geometry, plus candidate re-formulations of
the wgrad as an explicit dot_general.

Usage: python tools/bench_lift_wgrad.py {dsprites|particles|galaxy}
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

# cols (B*W' + pad), Ck, n2, RK, k
SHAPES = {
    "dsprites": (3256, 64, 128, 1024, 64),
    "particles": (3952, 64, 142, 1024, 64),
    "galaxy": (3200, 195, 129, 1024, 65),
}


def _time(fn, *args):
    g = jax.jit(fn)
    t0 = time.time()
    jax.device_get(g(*args))
    compile_s = time.time() - t0
    n_it = 20
    t0 = time.time()
    for _ in range(n_it):
        r = g(*args)
    jax.device_get(r)
    return (time.time() - t0) / n_it, compile_s


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "dsprites"
    cols, ck, n2, rk, k = SHAPES[name]
    hp = n2 - k + 1
    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.standard_normal((cols, ck, n2)), jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((rk, ck, k)), jnp.bfloat16)
    g_out = jnp.asarray(rng.standard_normal((hp, cols, rk)), jnp.bfloat16)
    flops = 2.0 * hp * cols * rk * ck * k

    def fwd(lhs, rhs):
        y = jax.lax.conv_general_dilated(
            lhs, rhs, (1,), "VALID",
            dimension_numbers=("NCW", "OIW", "WNC"))
        # force materialization in the kernel-operand layout
        return jax.lax.optimization_barrier(y)[0, 0, 0].astype(jnp.float32)

    def wgrad_auto(lhs, g_out):
        def f(rhs):
            y = jax.lax.conv_general_dilated(
                jax.lax.stop_gradient(lhs), rhs, (1,), "VALID",
                dimension_numbers=("NCW", "OIW", "WNC"))
            return jnp.sum(y.astype(jnp.float32) *
                           g_out.astype(jnp.float32))
        dr = jax.grad(f)(rhs)
        return jnp.sum(dr.astype(jnp.float32))

    def wgrad_dot(lhs, g_out):
        # dw[rk, c, dj] = sum_{i, col} g[i, col, rk] * lhs[col, c, i + dj]
        # as one dot_general over a strided window view of lhs:
        # windows[dj][col, c, i] = lhs[col, c, i + dj], i in [0, hp)
        wins = jnp.stack([jax.lax.dynamic_slice_in_dim(lhs, dj, hp, axis=2)
                          for dj in range(k)], axis=0)    # (k, cols, ck, hp)
        dr = jax.lax.dot_general(
            g_out, wins,
            ((( 0, 1), (3, 1)), ((), ())),
            preferred_element_type=jnp.float32)           # (rk, k, ck)
        return jnp.sum(dr)

    def wgrad_conv(lhs, g_out):
        # the hand-written native-layout wgrad conv shipped as the lift
        # conv's custom VJP (models/encoders.py::_lift_wgrad)
        from targetvae_tpu.models.encoders import _lift_wgrad
        return jnp.sum(_lift_wgrad(lhs, g_out))

    for label, fn, args in (
            ("fwd(materialized)", fwd, (lhs, rhs)),
            ("wgrad_auto", wgrad_auto, (lhs, g_out)),
            ("wgrad_dot", wgrad_dot, (lhs, g_out)),
            ("wgrad_conv", wgrad_conv, (lhs, g_out))):
        dt, compile_s = _time(fn, *args)
        print(f"{name} {label:18s}: {dt * 1e3:7.2f} ms "
              f"{flops / dt / 1e12:7.1f} TF/s  (compile {compile_s:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
