#!/usr/bin/env python
"""Microbench of the 1-D lift conv's XLA lowering per output layout.

The encoder's big-k lift (models/encoders.py::_mode_c_xla_matmul) is one
`lax.conv_general_dilated` whose requested OUTPUT dimension order steers
XLA's implicit-GEMM schedule. At EMPIAR shapes (n2=142, hp=79) the WNC
order hits ~190 TF/s, but the dsprites geometry (n2=128, hp=65) measured
only ~107 TF/s in-step; this tool times the candidate orders standalone so
layout choices are data, not guesses.

Usage: python tools/bench_lift_conv.py {dsprites|particles|galaxy}
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

SHAPES = {
    # cols (B*W' [+pad]), Ck, n2, RK, k
    "dsprites": (3256, 64, 128, 1024, 64),
    "particles": (3952, 64, 142, 1024, 64),
    "galaxy": (3200, 195, 129, 1024, 65),
}


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "dsprites"
    cols, ck, n2, rk, k = SHAPES[name]
    hp = n2 - k + 1
    rng = np.random.default_rng(0)
    lhs = jnp.asarray(rng.standard_normal((cols, ck, n2)), jnp.bfloat16)
    rhs = jnp.asarray(rng.standard_normal((rk, ck, k)), jnp.bfloat16)
    flops = 2.0 * hp * cols * rk * ck * k

    for out_order in ("WNC", "NWC", "NCW", "CWN", "CNW", "WCN"):
        def f(lhs, rhs, out_order=out_order):
            y = jax.lax.conv_general_dilated(
                lhs, rhs, (1,), "VALID",
                dimension_numbers=("NCW", "OIW", out_order))
            return jnp.sum(y.astype(jnp.float32))

        g = jax.jit(f)
        t0 = time.time()
        jax.device_get(g(lhs, rhs))
        compile_s = time.time() - t0
        n_it = 20
        t0 = time.time()
        for _ in range(n_it):
            r = g(lhs, rhs)
        jax.device_get(r)
        dt = (time.time() - t0) / n_it
        print(f"{name} out={out_order}: {dt * 1e3:7.2f} ms  "
              f"{flops / dt / 1e12:6.1f} TF/s  (compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
