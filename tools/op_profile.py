#!/usr/bin/env python
"""Op-level profile of a dataset config's training step on the TPU chip.

Usage: python tools/op_profile.py {mnist|dsprites|galaxy|particles|particles-ctf}
           [--batch N] [--steps N] [--top N]

Runs the same jitted step as tools/bench_config.py under jax.profiler.trace,
converts the xplane with xprof's raw_to_tool_data, and prints the top ops by
total self time. This is the trace-driven-optimization entry point recorded
in BENCH_NOTES.md (the ad-hoc round-1 version is now a tool).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    from tools.bench_config import build
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig

    cfg, n, c, ctf = build(args.config)
    batch = args.batch or {"mnist": 100, "mnist-p16": 100,
                           "mnist-a": 100, "mnist-b": 100,
                           "mnist-b-p8": 100, "dsprites": 50, "galaxy": 50,
                           "particles": 50, "particles-ctf": 50}[args.config]
    ctf_b = None if ctf is None else jax.numpy.asarray(ctf[:batch])
    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=2e-4,
                                         compute_dtype="bfloat16"))
    state = trainer.init_state(0)
    y = jax.random.uniform(jax.random.key(1), (batch, n, n, c))

    state, m = trainer._train_step(state, y, ctf=ctf_b)
    jax.device_get(m)

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="opprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, m = trainer._train_step(state, y, ctf=ctf_b)
        jax.device_get(m)

    from xprof.convert import raw_to_tool_data as rtd
    files = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)  # gviz table: {cols: [{label}], rows: [{c: [{v}]}]}
    labels = [c["label"] for c in obj["cols"]]
    i_time = labels.index("Total self time (us)")
    i_cat = labels.index("HLO op category")
    i_name = labels.index("HLO op name")
    i_occ = labels.index("#Occurrences")
    i_src = labels.index("Source Info")
    body = [[c.get("v") for c in r["c"]] for r in obj["rows"]]
    body.sort(key=lambda r: -(r[i_time] or 0))
    total = sum(r[i_time] or 0 for r in body)
    print(f"total self time {total/1e3:.2f} ms over {args.steps} steps "
          f"= {total/1e3/args.steps:.3f} ms/step")
    print(f"{'us/step':>9}  {'%':>5}  {'n':>4}  category / op / source")
    for r in body[: args.top]:
        src = r[i_src] or ""
        if "title" in src:  # strip the html wrapper
            src = src.split(">")[-2].split("<")[0]
        print(f"{(r[i_time] or 0)/args.steps:9.1f}  "
              f"{100*(r[i_time] or 0)/total:5.1f}  "
              f"{int(r[i_occ] or 0):4d}  {r[i_cat]:<14} {r[i_name][:52]:<52} "
              f"{src.replace('/root/repo/', '')}")


if __name__ == "__main__":
    main()
