#!/usr/bin/env python
"""Standalone timing of the fused pose decoder at a dataset config's shape.

Usage: python tools/bench_decoder.py {mnist|dsprites|galaxy|particles}
           [--batch N] [--tr N] [--steps N]

Times the decoder kernel OUTSIDE the train step (fwd alone, and fwd+bwd with
grads w.r.t. theta/dx/z/params reduced to a scalar on device — see
tools/profile_flagship.py::_scalarize for why). Compare against the in-step
attribution from tools/op_profile.py to detect enclosing-program effects like
the scoped-VMEM conv retry recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["mnist", "dsprites", "galaxy",
                                       "particles", "particles-ctf"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--tr", type=int, default=0)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--vmem", type=int, default=0,
                    help="xla_tpu_scoped_vmem_limit_kib for the bench jits")
    args = ap.parse_args()
    jit_kw = {}
    if args.vmem:
        jit_kw["compiler_options"] = {
            "xla_tpu_scoped_vmem_limit_kib": str(args.vmem)}
    jit = lambda f: jax.jit(f, **jit_kw)

    from tools.bench_config import build
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.models.generator import generator_init
    from targetvae_tpu.kernels.decoder_pose import fused_pose_decoder

    cfg, n, c, _ = build(args.config)
    batch = args.batch or {"mnist": 100}.get(args.config, 50)
    gcfg = cfg.generator
    params = generator_init(jax.random.key(0), gcfg)
    theta = jax.random.uniform(jax.random.key(1), (batch,), minval=-3.0,
                               maxval=3.0)
    dx = 0.1 * jax.random.normal(jax.random.key(2), (batch, 2))
    z = jax.random.normal(jax.random.key(3), (batch, gcfg.z_dim))

    def scalarize(t):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(t))

    @jit
    def fwd(params, theta, dx, z):
        y = fused_pose_decoder(theta, dx, z, params, gcfg, n, tr=args.tr)
        return scalarize(y)

    @jit
    def fwdbwd(params, theta, dx, z):
        def loss(params, theta, dx, z):
            y = fused_pose_decoder(theta, dx, z, params, gcfg, n, tr=args.tr)
            return scalarize(y)
        g = jax.grad(loss, argnums=(0, 1, 2, 3))(params, theta, dx, z)
        return scalarize(g)

    for name, fn in [("dec_fwd", fwd), ("dec_fwdbwd", fwdbwd)]:
        t0 = time.time()
        out = fn(params, theta, dx, z)
        jax.device_get(out)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.steps):
            out = fn(params, theta, dx, z)
        jax.device_get(out)
        dt = (time.time() - t0) / args.steps * 1e3
        print(f"{name:11s} {args.config} B={batch} n={n} tr={args.tr or 'auto'}: "
              f"{dt:7.2f} ms  (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
