#!/usr/bin/env python
"""Dump the compiled (post-optimization) HLO of a dataset config's train step.

Usage: python tools/dump_step_hlo.py {mnist|dsprites|...} [--batch N]
           [--grep PATTERN] [--out FILE]

Uses the same step builder as tools/bench_config.py; the persistent
compilation cache makes this cheap after a bench/profile run of the same
config. With --grep, prints only matching instruction lines (plus shapes),
e.g. --grep convolution to see the conv fusions' operand/result layouts.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

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
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--grep", default=None)
    ap.add_argument("--fusion", default=None,
                    help="print the full body of this fusion computation")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tools.bench_config import build
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig

    cfg, n, c, ctf = build(args.config)
    batch = args.batch or {"mnist": 100, "dsprites": 50, "galaxy": 50,
                           "particles": 50, "particles-ctf": 50}[args.config]
    ctf_b = None if ctf is None else jax.numpy.asarray(ctf[:batch])
    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=2e-4,
                                         compute_dtype="bfloat16"))
    state = trainer.init_state(0)
    y = jax.random.uniform(jax.random.key(1), (batch, n, n, c))

    step = trainer._train_step
    lowered = step.lower(state, y, ctf_b)
    txt = lowered.compile().as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        print(f"wrote {len(txt)} bytes to {args.out}", file=sys.stderr)
    if args.fusion:
        # print the computation whose name contains the fusion tag
        pat = re.compile(r"^%?\S*" + re.escape(args.fusion))
        emit = False
        for line in txt.splitlines():
            if line.startswith("}"):
                if emit:
                    print(line)
                emit = False
            if pat.match(line.strip()) and "{" in line:
                emit = True
            if emit:
                print(line)
    elif args.grep:
        pat = re.compile(args.grep)
        for line in txt.splitlines():
            if pat.search(line):
                print(line.rstrip())


if __name__ == "__main__":
    main()
