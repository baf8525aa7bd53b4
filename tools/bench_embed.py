#!/usr/bin/env python
"""Inference/serving benchmark: deterministic latent-embedding throughput.

Usage: python tools/bench_embed.py {mnist|mnist-b|dsprites|galaxy|particles}
           [--batch N] [--steps N] [--f32]

Measures `TargetVAE.embed` (the clustering/serving entry point used by all
four clustering CLIs via cli/clustering_common.py::embed_dataset — the
argmax-cell latent extraction of reference clustering_mnist.py:45-164) as a
jitted on-device function: encoder forward + posterior argmax + expected
translation, no sampling, no decoder. This is the number a production
embedding service (particle-stack triage, latent indexing) runs at.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["mnist", "mnist-b", "mnist-b-p8",
                                       "dsprites", "galaxy",
                                       "particles", "particles-ctf"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    from tools.bench_config import build
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig

    cfg, n, c, _ = build(args.config)
    # embedding batches are latency-insensitive; default to larger batches
    # than training (the whole batch is one encoder forward)
    batch = args.batch or {"mnist": 500, "mnist-b": 500, "mnist-b-p8": 500,
                           "dsprites": 250, "galaxy": 250,
                           "particles": 100, "particles-ctf": 100}[args.config]
    dtype = None if args.f32 else "bfloat16"
    model = TargetVAE(cfg)
    params = Trainer(model, TrainConfig(learning_rate=2e-4,
                                        compute_dtype=dtype)).init_state(0).params
    y = jax.random.uniform(jax.random.key(1), (batch, n, n, c))

    import jax.numpy as jnp
    embed = jax.jit(lambda p, y: model.embed(p, y, compute_dtype=(
        None if args.f32 else jnp.bfloat16)))

    t0 = time.time()
    out = embed(params, y)
    jax.device_get(out["z_content"][0, 0])
    print(f"# compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    for _ in range(args.steps):
        out = embed(params, y)
    # scalar on-device reduction before device_get (CLAUDE.md microbench rule)
    s = jax.jit(lambda o: sum(jnp.sum(v) for v in o.values()))(out)
    jax.device_get(s)
    dt = (time.time() - t0) / args.steps

    print(f"{args.config} embed batch={batch} dtype={dtype or 'f32'}: "
          f"{dt * 1e3:.2f} ms/batch = {batch / dt:.0f} images/sec")
    print(json.dumps({
        "config": args.config, "batch": batch, "dtype": dtype or "f32",
        "ms_per_batch": round(dt * 1e3, 2),
        "images_per_sec": round(batch / dt, 1),
        "mode": "embed",
    }))


if __name__ == "__main__":
    main()
