#!/usr/bin/env python
"""Measure the mesh-machinery overhead of the shard_map loss on ONE chip.

VERDICT r3 #8: the only multi-device code path a single chip can time. Runs
the flagship training step twice — meshless (the plain jit `_train_step`)
and through a 1x1 ('data','model') Mesh, which engages the per-shard
shard_map loss (`Trainer._loss_fn_dp`: batch split over both axes, params
gathered to P() at the loss boundary, scalars pmean'd) with the Pallas
kernels live — and reports the delta. On one device every collective is a
no-op copy at most, so the delta isolates the shard_map/GSPMD machinery
cost that multi-chip runs would pay on top of compute.

Usage: python tools/bench_mesh_overhead.py [--batch N] [--steps N]
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


def _time_steps(step, state, y, n_steps):
    state, m = step(state, y)
    jax.device_get(m)
    t0 = time.time()
    for _ in range(n_steps):
        state, m = step(state, y)
    jax.device_get(m)
    return (time.time() - t0) / n_steps * 1e3, state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_config
    from jax.sharding import Mesh
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.parallel.pjit import shard_batch, shard_state
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig

    cfg = _flagship_config()
    y = jnp.asarray(jax.random.uniform(
        jax.random.key(1), (args.batch, 50, 50, 1)))

    # meshless baseline
    model = TargetVAE(cfg)
    tr = Trainer(model, TrainConfig(learning_rate=2e-4,
                                    compute_dtype="bfloat16"))
    state = tr.init_state(0)
    base_ms, _ = _time_steps(lambda s, yy: tr._train_step(s, yy),
                             state, y, args.steps)
    print(f"meshless   {base_ms:7.2f} ms/step", flush=True)

    # 1x1 ('data','model') mesh: same step through the shard_map loss,
    # with state and batch committed to the mesh exactly as fit.py does
    # (an uncommitted state forces per-step resharding)
    tr2 = Trainer(TargetVAE(cfg), TrainConfig(learning_rate=2e-4,
                                              compute_dtype="bfloat16"))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    tr2.attach_mesh(mesh)
    assert tr2._use_mesh_shardmap()
    state2 = shard_state(mesh, tr2.init_state(0))
    y2, _ = shard_batch(mesh, y, None)
    mesh_ms, _ = _time_steps(
        lambda s, yy: tr2._train_step(s, yy), state2, y2, args.steps)
    print(f"1x1 mesh   {mesh_ms:7.2f} ms/step", flush=True)
    print(f"overhead   {mesh_ms - base_ms:+7.2f} ms "
          f"({(mesh_ms / base_ms - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
