#!/usr/bin/env python
"""Benchmark: flagship MNIST-U P8 TARGET-VAE training throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Config matches BASELINE.json configs[1]: image_dim 50, z=2, P8 group conv,
t-inf attention, r-inf attention+offsets, --fourier-expansion, minibatch 100,
full training step (forward ELBO + backward + Adam update).

vs_baseline compares against the PyTorch reference implementation executing
the same config on this host's CPU (the only hardware the reference can run
on here), cached in BASELINE_MEASURED.json; see BENCH_NOTES.md.
"""

import json
import os
import sys
import time

import jax

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# persistent compilation cache: the Pallas/Mosaic path takes minutes to
# compile through this environment's remote AOT helper, once per code change
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def check_device_reachable(timeout_s: int = 300) -> None:
    """Fail fast (instead of hanging forever) when the TPU tunnel is down:
    backend init blocks indefinitely inside jax.devices(), so probe it in a
    killable subprocess first."""
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"device enumeration hung for {timeout_s}s — TPU tunnel down?")
    if probe.returncode != 0:
        raise RuntimeError(
            "device backend failed to initialize:\n"
            + probe.stderr.decode(errors="replace")[-1000:])


def measure_tpu(batch: int = 100, steps: int = 30,
                compute_dtype=None) -> float:
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig
    from __graft_entry__ import _flagship_config

    model = TargetVAE(_flagship_config())
    trainer = Trainer(model, TrainConfig(learning_rate=2e-4,
                                         compute_dtype=compute_dtype))
    state = trainer.init_state(0)
    y = jax.random.uniform(jax.random.key(1), (batch, 50, 50, 1))

    state, m = trainer._train_step(state, y)   # compile + warmup
    jax.device_get(m)
    t0 = time.time()
    for _ in range(steps):
        state, m = trainer._train_step(state, y)
    jax.device_get(m)
    dt = (time.time() - t0) / steps
    return batch / dt


def load_baseline() -> float:
    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)["pytorch_reference_cpu_images_per_sec"]
    return 0.0


def main():
    check_device_reachable()
    results = {}   # (mode, batch) -> img/s
    results[("f32", 100)] = measure_tpu(compute_dtype=None)
    try:
        results[("bf16+pallas", 100)] = measure_tpu(compute_dtype="bfloat16")
        # img/s/chip is the north-star metric and does NOT fix the batch
        # size (BASELINE.json); B=256 measures a reproducible ~2% over
        # B=100 with the round-5 kernels (round-5 batch-scaling sweep) —
        # headline the best batch, keep the B=100 row for comparability
        results[("bf16+pallas", 256)] = measure_tpu(batch=256,
                                                    compute_dtype="bfloat16")
    except Exception as e:  # pragma: no cover - kernel path is TPU-only
        print(f"# bf16/pallas path failed: {e}", file=sys.stderr)
    mode, batch = max(results, key=results.get)
    ips = results[(mode, batch)]
    baseline = load_baseline()

    # analytic per-step matmul FLOPs -> MFU (utils/flops.py)
    from targetvae_tpu.utils.flops import step_flops, mfu, V5E_BF16_PEAK
    from __graft_entry__ import _flagship_config
    fl = step_flops(_flagship_config(), batch)["total"]
    step_s = batch / ips

    out = {
        "metric": "images/sec/chip, MNIST-U P8 attention+offsets train step "
                  f"(fwd+bwd+Adam, batch {batch}, TPU v5e, {mode})",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline, 2) if baseline else None,
        # vs_baseline is TPU-chip vs the PyTorch reference on this HOST CPU
        # (the only hardware it can run on here) — it is NOT the BASELINE
        # north-star ratio (>=5x A100-PyTorch), which cannot be measured
        # from this machine. Do not quote it as such (BENCH_NOTES.md).
        "vs_baseline_hw": "pytorch reference on host CPU "
                          "(no A100 attached; not the A100 north-star)",
        "tflops_per_step": round(fl / 1e12, 3),
        "mfu": round(mfu(fl, step_s), 4),
        "mfu_peak_tflops": V5E_BF16_PEAK / 1e12,
    }
    print(json.dumps(out))

    # append to the machine-readable history feeding the BENCH_NOTES.md
    # canonical table (record() re-splices the table in place)
    from targetvae_tpu.utils.bench_log import record
    for (m, b), r in results.items():
        if m != "bf16+pallas":
            continue
        f = step_flops(_flagship_config(), b)["total"]
        s = b / r
        record({"config": "flagship" if b == 100 else f"flagship-b{b}",
                "batch": b, "dtype": m,
                "ms_per_step": round(s * 1e3, 2),
                "images_per_sec": round(r, 1),
                "tflops_per_step": round(f / 1e12, 3),
                "mfu": round(mfu(f, s), 4)})


if __name__ == "__main__":
    main()
