#!/usr/bin/env python
"""Per-config training-step benchmark on the attached TPU chip.

Usage: python tools/bench_config.py {mnist|dsprites|galaxy|particles}
           [--batch N] [--steps N] [--f32]

Measures the full jitted train step (ELBO fwd + bwd + Adam) on synthetic
data shaped like the named dataset config (BASELINE.json configs). Used for
the secondary rows in BENCH_NOTES.md; the official flagship bench is
bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def build(name: str):
    from targetvae_tpu.utils.config import (EncoderConfig, GeneratorConfig,
                                            LikelihoodConfig, ModelConfig)
    if name == "mnist":
        from __graft_entry__ import _flagship_config
        return _flagship_config(), 50, 1, None
    if name == "mnist-p16":
        # the finest rotation grid the reference exposes (--groupconv 16,
        # src/models.py:366): a 16x51x51 = 41.6k-cell joint posterior at the
        # flagship shape (QUALITY.md round-5 P16 rows train this config)
        from __graft_entry__ import _flagship_config
        return _flagship_config(groupconv=16), 50, 1, None
    if name == "mnist-a":
        # mode A (unimodal x unimodal): the reference's simplest inference
        # family — one MLP over the flattened image emitting all latents
        # (src/models.py:229-260, selected by train_mnist.py:551-566 when
        # both inferences are unimodal). No attention grid, no group conv.
        image_dim = 50
        cfg = ModelConfig(
            generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=1,
                                      num_layers=2, fourier_expansion=True,
                                      fourier_sigma=2.0 / (image_dim - 1)),
            encoder=EncoderConfig(t_inf="unimodal", r_inf="unimodal",
                                  image_dim=image_dim, in_channels=1, z_dim=2,
                                  kernels_num=128, num_layers=2,
                                  theta_prior=np.pi),
            likelihood=LikelihoodConfig(kind="bernoulli"))
        return cfg, image_dim, 1, None
    if name in ("mnist-b", "mnist-b-p8"):
        # mode B (attention x unimodal): BASELINE configs[0]'s model family
        # at the flagship shape. groupconv 0 = plain image-sized conv
        # (reference src/models.py:282-288); -p8 adds the group lift + fc_r.
        image_dim = 50
        cfg = ModelConfig(
            generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=1,
                                      num_layers=2, fourier_expansion=True,
                                      fourier_sigma=2.0 / (image_dim - 1)),
            encoder=EncoderConfig(t_inf="attention", r_inf="unimodal",
                                  image_dim=image_dim, in_channels=1, z_dim=2,
                                  kernels_num=128,
                                  groupconv=8 if name.endswith("p8") else 0,
                                  theta_prior=np.pi),
            likelihood=LikelihoodConfig(kind="bernoulli"))
        return cfg, image_dim, 1, None
    if name == "dsprites":
        image_dim = 64
        cfg = ModelConfig(
            generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=1,
                                      num_layers=2, fourier_expansion=True,
                                      fourier_sigma=0.01),
            encoder=EncoderConfig(t_inf="attention",
                                  r_inf="attention+offsets",
                                  image_dim=image_dim, in_channels=1, z_dim=2,
                                  kernels_num=128, kernels_size=64,
                                  padding=32, groupconv=8,
                                  theta_prior=np.pi,
                                  normal_prior_over_r=False),
            likelihood=LikelihoodConfig(kind="bernoulli"))
        return cfg, image_dim, 1, None
    if name == "galaxy":
        image_dim = 64
        cfg = ModelConfig(
            generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=3,
                                      num_layers=4, fourier_expansion=True,
                                      fourier_sigma=2.0 / (image_dim - 1)),
            encoder=EncoderConfig(t_inf="attention",
                                  r_inf="attention+offsets",
                                  image_dim=image_dim, in_channels=3, z_dim=2,
                                  kernels_num=128, kernels_size=65,
                                  padding=16, groupconv=8,
                                  theta_prior=np.pi,
                                  normal_prior_over_r=False),
            likelihood=LikelihoodConfig(kind="bernoulli"))
        return cfg, image_dim, 3, None
    if name in ("particles", "particles-ctf"):
        image_dim = 110
        with_ctf = name == "particles-ctf"
        cfg = ModelConfig(
            generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=1,
                                      num_layers=2, fourier_expansion=True,
                                      fourier_sigma=2.0 / (image_dim - 1)),
            encoder=EncoderConfig(t_inf="attention",
                                  r_inf="attention+offsets",
                                  image_dim=image_dim, in_channels=1, z_dim=2,
                                  kernels_num=128, kernels_size=64,
                                  padding=16, groupconv=8,
                                  theta_prior=np.pi,
                                  normal_prior_over_r=False),
            likelihood=LikelihoodConfig(
                kind="gaussian", mask_radius=45 if with_ctf else 0))
        ctf = None
        if with_ctf:
            import pandas as pd
            from targetvae_tpu.data.ctf import ctf_filter
            kc = image_dim - 1
            df = pd.DataFrame({
                "defocus": np.linspace(10000.0, 25000.0, 512),
                "cs": 2.0, "voltage": 300.0, "apix": 1.5, "bfactor": 0.0,
                "ampcont": 0.07, "dfdiff": 0.0, "dfang": 0.0})
            ctf = np.asarray(ctf_filter(df, kc, kc), np.float32)
        return cfg, image_dim, 1, ctf
    raise SystemExit(f"unknown config {name!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", choices=["mnist", "mnist-p16", "mnist-a",
                                       "mnist-b", "mnist-b-p8", "dsprites",
                                       "galaxy", "particles",
                                       "particles-ctf"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig

    cfg, n, c, ctf = build(args.config)
    default_batch = {"mnist": 100, "mnist-p16": 100, "mnist-a": 100,
                     "mnist-b": 100, "mnist-b-p8": 100, "dsprites": 50,
                     "galaxy": 50, "particles": 50,
                     "particles-ctf": 50}[args.config]
    batch = args.batch or default_batch
    ctf_b = None if ctf is None else jax.numpy.asarray(ctf[:batch])
    dtype = None if args.f32 else "bfloat16"
    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=2e-4,
                                         compute_dtype=dtype))
    state = trainer.init_state(0)
    y = jax.random.uniform(jax.random.key(1), (batch, n, n, c))

    t0 = time.time()
    state, m = trainer._train_step(state, y, ctf=ctf_b)
    jax.device_get(m)
    print(f"# compile+warmup {time.time() - t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(args.steps):
        state, m = trainer._train_step(state, y, ctf=ctf_b)
    jax.device_get(m)
    dt = (time.time() - t0) / args.steps

    from targetvae_tpu.utils.flops import step_flops, mfu
    fl = step_flops(cfg, batch,
                    ctf_dim=None if ctf is None else ctf.shape[-1])
    print(f"{args.config} batch={batch} dtype={dtype or 'f32'}: "
          f"{dt * 1e3:.1f} ms/step = {batch / dt:.1f} images/sec | "
          f"{fl['total'] / 1e12:.2f} TFLOP/step, MFU {mfu(fl['total'], dt):.1%}"
          f" (vs 197 TF/s bf16 peak)")
    top = sorted(fl["breakdown"].items(), key=lambda kv: -kv[1])
    print("# flops breakdown: "
          + ", ".join(f"{k}={v / 1e12:.2f}T" for k, v in top),
          file=sys.stderr)
    import json
    # non-default batches record under a distinct "-b{N}" history key (the
    # flagship-b256 pattern) so sweeps never clobber the canonical
    # default-batch row of the table
    config_key = (args.config if batch == default_batch
                  else f"{args.config}-b{batch}")
    result = {
        "config": config_key, "batch": batch,
        "dtype": dtype or "f32", "ms_per_step": round(dt * 1e3, 2),
        "images_per_sec": round(batch / dt, 1),
        "tflops_per_step": round(fl["total"] / 1e12, 3),
        "mfu": round(mfu(fl["total"], dt), 4),
    }
    print(json.dumps(result))
    # history feeding the BENCH_NOTES.md canonical table; regenerate it with
    # tools/update_bench_table.py (tests/test_bench_table.py guards drift)
    from targetvae_tpu.utils.bench_log import record
    record(result)


if __name__ == "__main__":
    main()
