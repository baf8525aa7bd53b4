#!/usr/bin/env python
"""Microbench of the FULL lift-conv producer chain (im2col q assembly ->
1-D conv), with and without an optimization barrier between them.

tools/op_profile.py shows the dsprites in-step fwd lift conv at ~107 TF/s
(16.6 ms) while the same conv reading a pre-materialized operand runs
147 TF/s standalone (tools/bench_lift_conv.py) — hypothesis: XLA fuses the
patch-window stack INTO the conv and re-gathers per tile. This times the
chain both ways so the fix is data, not a guess.

Usage: python tools/bench_lift_chain.py {dsprites|particles|galaxy}
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

# image n, C, k, pad, R*K, batch, batch-pad padc
SHAPES = {
    "dsprites": (64, 1, 64, 32, 1024, 50, 6),
    "particles": (110, 1, 64, 16, 1024, 50, 2),
    "galaxy": (97, 3, 65, 16, 1024, 50, 0),
}


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "dsprites"
    n, C, k, pad, rk, b, padc = SHAPES[name]
    n2 = n + 2 * pad
    hp = n2 - k + 1
    cols = b * hp
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((b, n, n, C)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((rk, C * k, k)), jnp.bfloat16)
    flops = 2.0 * hp * (cols + padc) * rk * C * k * k

    g_out = jnp.asarray(rng.standard_normal((hp, cols + padc, rk)),
                        jnp.bfloat16)

    def chain(y, rhs, g_out, mode):
        xp = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        q = jnp.stack([xp[:, :, dj:dj + hp, :] for dj in range(k)],
                      axis=-1).astype(jnp.bfloat16)
        lhs = jnp.transpose(q, (0, 2, 3, 4, 1)).reshape(b * hp, C * k, n2)
        if padc:
            lhs = jnp.pad(lhs, ((0, padc), (0, 0), (0, 0)))
        if "barrier" in mode:
            lhs = jax.lax.optimization_barrier(lhs)
        if "dup" in mode:
            # give the wgrad conv its OWN copy of the lhs: separate barrier
            # outputs so layout assignment can pick each conv's preferred
            # operand layout (in-step, the shared lhs gets the wgrad-optimal
            # cols-minor layout and the fwd conv pays a slow XposeReuse
            # emitter: 16.6 vs 11.7 ms standalone at the dsprites shape)
            lhs_f, lhs_w = jax.lax.optimization_barrier((lhs, lhs))
        else:
            lhs_f = lhs_w = lhs
        out = jax.lax.conv_general_dilated(
            lhs_f, rhs, (1,), "VALID",
            dimension_numbers=("NCW", "OIW", "WNC"))
        if "sum" in mode:
            acc = jnp.sum(out.astype(jnp.float32))
        else:  # materialize the output in its own layout, like a kernel call
            acc = jax.lax.optimization_barrier(out)[0, 0, 0].astype(
                jnp.float32)
        if "wgrad" in mode:
            dr = jax.grad(lambda r: jnp.sum(
                jax.lax.conv_general_dilated(
                    lhs_w, r, (1,), "VALID",
                    dimension_numbers=("NCW", "OIW", "WNC"))
                .astype(jnp.float32) * g_out.astype(jnp.float32)))(rhs)
            acc = acc + jnp.sum(dr.astype(jnp.float32))
        return acc

    for mode in ("mat+wgrad", "mat+wgrad+dup"):
        g = jax.jit(lambda y, r, go, mode=mode: chain(y, r, go, mode))
        t0 = time.time()
        jax.device_get(g(y, rhs, g_out))
        compile_s = time.time() - t0
        n_it = 20
        t0 = time.time()
        for _ in range(n_it):
            r = g(y, rhs, g_out)
        jax.device_get(r)
        dt = (time.time() - t0) / n_it
        scale = 2.0 if "wgrad" in mode else 1.0
        print(f"{name} {mode:12s}:  {dt * 1e3:7.2f} ms "
              f"{scale * flops / dt / 1e12:7.1f} TF/s  "
              f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
