#!/usr/bin/env python
"""Standalone embedding/serving tool: particle stack -> latents, no
clustering step.

The production triage workflow reference users assemble by hand from
clustering_particles.py's internals (reference clustering_mnist.py:45-164's
get_latent without the k-means/figures tail): embed an arbitrary MRC stack
(or .npy / directory of .mrcs) with a trained encoder and write
`<out>_z.npy` (N, 2*z_dim: [z_mu; z_std]), `<out>_rot.npy` (N, 1) and
`<out>_trans.npy` (N, 2) for downstream indexing/triage/selection.

Accepts our msgpack checkpoints AND the reference's pickled torch
`inference.sav` (utils/torch_import.py). `--compute-dtype bfloat16` engages
the fused TPU serving tier (3.3x the f32 embed throughput at the EMPIAR
shape — tools/bench_embed.py).

Usage:
  python tools/embed_stack.py --input particles.mrcs \
      --path-to-encoder RUN_DIR/inference.sav --out latents/run1 \
      --normalize --compute-dtype bfloat16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        "Embed a particle stack to latent/pose arrays (no clustering)")
    ap.add_argument("--input", required=True,
                    help="MRC stack, directory of .mrcs, or .npy image array")
    ap.add_argument("--path-to-encoder", required=True,
                    help="trained encoder checkpoint (ours or a reference "
                         "pickled inference.sav)")
    ap.add_argument("--out", required=True,
                    help="output prefix; writes <out>_z.npy, <out>_rot.npy, "
                         "<out>_trans.npy")
    ap.add_argument("--normalize", action="store_true",
                    help="per-particle standardization (match training)")
    ap.add_argument("--crop", default=0, type=int,
                    help="center-crop to this size (match training)")
    ap.add_argument("--downsample", default=0, type=int,
                    help="Fourier-crop (bin) to this size (match a "
                         "--downsample training run)")
    ap.add_argument("--minibatch-size", type=int, default=100)
    ap.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                    default="bfloat16",
                    help="bfloat16 (default) = fused TPU serving tier; "
                         "float32 bit-matches the reference protocol")
    ap.add_argument("-d", "--device", type=int, default=0)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)

    from targetvae_tpu.cli.common import select_device
    select_device(args.device)

    from targetvae_tpu.cli.clustering_common import (embed_dataset,
                                                     load_encoder)
    from targetvae_tpu.data.datasets import (load_particles,
                                             preprocess_particles)

    if args.input.endswith(".npy"):
        images = np.load(args.input).astype(np.float32)
    else:
        images = load_particles(args.input)
    if args.downsample and args.downsample < images.shape[-1]:
        from targetvae_tpu.data.image import downsample
        images = downsample(images, shape=(args.downsample,
                                           args.downsample))
        images = np.asarray(images, np.float32)
    images = preprocess_particles(images, args.crop, args.normalize)
    if images.ndim == 3:
        images = images[..., None]

    model, params = load_encoder(args.path_to_encoder)
    t0 = time.time()
    z, rot, tr = embed_dataset(model, params, images, args.minibatch_size,
                               args.compute_dtype)
    dt = time.time() - t0
    print(f"# embedded {len(images)} particles in {dt:.2f}s "
          f"({len(images) / dt:.0f} images/sec incl. compile)",
          file=sys.stderr)

    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    np.save(args.out + "_z.npy", z)
    np.save(args.out + "_rot.npy", rot)
    np.save(args.out + "_trans.npy", tr)
    print(f"# wrote {args.out}_{{z,rot,trans}}.npy", file=sys.stderr)


if __name__ == "__main__":
    main()
