#!/usr/bin/env python
"""Measure --host-stream throughput vs device-resident at the EMPIAR shape.

VERDICT r3 #5b: the streaming feed (data/pipeline.HostDataPipeline + the
native threaded gather) replaces the reference's whole-dataset-on-device
design (train_mnist.py:495-500) and is the only path for EMPIAR-scale
stacks that exceed HBM, so it must keep the chip fed. Both sides run the
SAME compiled per-batch step (`Trainer._train_step`, one compile shared
with tools/bench_config.py particles-ctf); the delta isolates the host
shuffle/gather + H2D transfer + per-step dispatch against on-device
batches dispatched from the same Python loop.

Usage: python tools/bench_host_stream.py [--n N] [--batch N] [--epochs N]
"""

from __future__ import annotations

import argparse
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from tools.bench_config import build
    from targetvae_tpu.data.pipeline import HostDataPipeline
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig

    cfg, n, c, ctf512 = build("particles-ctf")
    rng = np.random.default_rng(0)
    y_host = rng.random((args.n, n, n, c), np.float32)
    reps = -(-args.n // ctf512.shape[0])
    ctf_host = np.tile(ctf512, (reps, 1, 1))[:args.n]

    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=2e-4,
                                         compute_dtype="bfloat16"))
    state = trainer.init_state(0)

    # warm up / compile the shared step once (with the pipeline's uniform
    # row-weight operand so resident and streamed runs share ONE program)
    yb = jnp.asarray(y_host[:args.batch])
    cb = jnp.asarray(ctf_host[:args.batch])
    wb = jnp.full((args.batch,), 1.0 / args.batch, jnp.float32)
    t0 = time.time()
    state, m = trainer._train_step(state, yb, cb, wb)
    jax.device_get(m)
    print(f"# compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)

    # warm the bf16-wire step too (separate program: y/ctf arrive bf16 and
    # are upcast at the loss boundary — train/loop._loss_fn)
    t0 = time.time()
    state, m = trainer._train_step(state, yb.astype(jnp.bfloat16),
                                   cb.astype(jnp.bfloat16), wb)
    jax.device_get(m)
    print(f"# bf16-wire compile+warmup {time.time() - t0:.1f}s",
          file=sys.stderr)

    nb = args.n // args.batch
    n_used = nb * args.batch

    # device-resident: batches already in HBM, same Python dispatch loop
    y_dev = jnp.asarray(y_host[:n_used]).reshape(nb, args.batch, n, n, c)
    ctf_dev = jnp.asarray(ctf_host[:n_used]).reshape(
        (nb, args.batch) + ctf_host.shape[1:])
    for label in ("resident", "stream", "stream-bf16"):
        times = []
        for ep in range(args.epochs):
            t0 = time.time()
            if label == "resident":
                for i in range(nb):
                    state, m = trainer._train_step(state, y_dev[i],
                                                   ctf_dev[i], wb)
            else:
                pipe = HostDataPipeline(
                    y_host[:n_used], ctf_host[:n_used],
                    batch_size=args.batch, seed=ep,
                    wire_dtype="bfloat16" if label == "stream-bf16"
                    else None)
                for yb2, cb2, wb2, _ in pipe.epoch(ep):
                    state, m = trainer._train_step(state, yb2, cb2, wb2)
            jax.device_get(m)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{label:11s} {n_used / dt:7.1f} images/sec "
              f"({dt / nb * 1e3:.1f} ms/batch over {nb} batches, "
              f"best of {args.epochs})", flush=True)


if __name__ == "__main__":
    main()
