#!/usr/bin/env python
"""Visualize a trained TARGET-VAE: reconstructions and pose-normalized
content (the reference README demonstrates these as GIFs but ships no tool).

For each input image, the encoder infers (z, theta, dx); the generator is
evaluated twice: on the inferred-pose grid (reconstruction) and on the plain
grid (canonical/pose-normalized content). Writes a PNG grid.

Usage:
  python tools/reconstruct.py --path-to-encoder RUN/inference.sav \
      --path-to-generator RUN/generator.sav --images data.npy [--n 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--path-to-encoder", required=True)
    ap.add_argument("--path-to-generator", required=True)
    ap.add_argument("--images", required=True,
                    help="npy (N,H,W[,C]) or .mrc/.mrcs stack")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default=None,
                    help="output png (default: <run>/reconstructions.png)")
    ap.add_argument("--scale255", action="store_true",
                    help="divide inputs by 255")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from targetvae_tpu.cli.clustering_common import load_encoder
    from targetvae_tpu.data.datasets import load_particles
    from targetvae_tpu.models.encoders import encoder_apply
    from targetvae_tpu.ops.coords import image_grid, transform_coords
    from targetvae_tpu.train.checkpoint import load_checkpoint

    model, enc_params = load_encoder(args.path_to_encoder)  # either format
    from targetvae_tpu.utils.torch_import import (generator_from_sav,
                                                  is_torch_checkpoint)
    if is_torch_checkpoint(args.path_to_generator):
        # reference pickled generator.sav: import and adopt its config
        import dataclasses

        from targetvae_tpu.models import TargetVAE
        gen_cfg, gparams = generator_from_sav(args.path_to_generator)
        model = TargetVAE(dataclasses.replace(model.cfg, generator=gen_cfg))
    else:
        gen_params, _, _ = load_checkpoint(args.path_to_generator)
        gparams = gen_params["generator"]
    params = {"encoder": enc_params["encoder"], "generator": gparams}
    cfg = model.cfg

    if args.images.endswith((".mrc", ".mrcs")):
        imgs = load_particles(args.images)
    else:
        imgs = np.load(args.images).astype(np.float32)
    if args.scale255:
        imgs = imgs / 255.0
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    imgs = imgs[:args.n].astype(np.float32)
    b = len(imgs)
    n = cfg.encoder.image_dim

    emb = model.embed(params, jnp.asarray(imgs))
    enc = encoder_apply(params["encoder"], cfg.encoder, jnp.asarray(imgs),
                        key=None)
    theta = emb["theta_mu"][:, 0]
    dx = emb["dx"]
    zd = cfg.encoder.z_dim
    z = emb["z_content"][:, :zd]

    grid = jnp.asarray(image_grid(n))
    x_pose = transform_coords(grid, dx, theta)
    x_plain = jnp.tile(grid[None], (b, 1, 1))
    recon = np.asarray(model.decode(params, x_pose, z))[..., 0]
    canon = np.asarray(model.decode(params, x_plain, z))[..., 0]
    if cfg.likelihood.kind == "bernoulli":
        recon = 1 / (1 + np.exp(-recon))
        canon = 1 / (1 + np.exp(-canon))
    recon = recon.reshape(b, n, n)
    canon = canon.reshape(b, n, n)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(3, b, figsize=(1.6 * b, 5))
    for i in range(b):
        axes[0, i].imshow(imgs[i, ..., 0], cmap="gray")
        axes[1, i].imshow(recon[i], cmap="gray")
        axes[2, i].imshow(canon[i], cmap="gray")
        for r in range(3):
            axes[r, i].axis("off")
    axes[0, 0].set_title("input", loc="left")
    axes[1, 0].set_title("reconstruction", loc="left")
    axes[2, 0].set_title("pose-normalized", loc="left")
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.path_to_encoder)),
        "reconstructions.png")
    plt.tight_layout()
    plt.savefig(out, dpi=120)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
