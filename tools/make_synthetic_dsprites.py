#!/usr/bin/env python
"""Synthetic dSprites-style dataset for end-to-end quality validation of the
dsprites vertical without external data (zero egress; the real dSprites npz
is unreachable). Mirrors the file layout `cli/clustering_dsprites.py` expects
(reference clustering_dsprites.py:248-259): binary 64x64 images in
imgs_{train,test}.npy plus a latents array latent_{train,test}.npy whose
columns follow the dSprites `latents_values` convention
[color, shape, scale, orientation, posX, posY] — shape labels in column 1,
orientation in column 3, position in columns 4:6.

Three shape classes like the real dSprites (square, ellipse, heart — the
heart being the one rotationally asymmetric class), uniform ground-truth
rotations in [0, 2pi), uniform +-`max_shift`-px translations, binary {0,1}
pixels (train_dsprites.py loads with scale255=False).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from scipy import ndimage

STAMP = 32  # sprite stamp edge; placed centered on the 64x64 canvas


def draw_sprite(cls: int) -> np.ndarray:
    """One binary sprite on a STAMP x STAMP stamp, centered."""
    s = np.zeros((STAMP, STAMP), np.float32)
    c = STAMP // 2
    yy, xx = np.mgrid[:STAMP, :STAMP]
    if cls == 0:      # square (4-fold symmetric)
        s[c - 8:c + 8, c - 8:c + 8] = 1
    elif cls == 1:    # ellipse (2-fold symmetric)
        s[((yy - c) / 11.0) ** 2 + ((xx - c) / 6.0) ** 2 <= 1.0] = 1
    else:             # heart (rotationally asymmetric, like dSprites)
        x = (xx - c) / 9.0
        y = -(yy - c) / 9.0 + 0.25
        s[(x ** 2 + y ** 2 - 1.0) ** 3 - x ** 2 * y ** 3 <= 0.0] = 1
    return s


def make_split(n, image_dim, max_shift, scales, rng):
    shape = rng.randint(0, 3, n)
    scale = scales[rng.randint(0, len(scales), n)]
    theta = rng.uniform(0.0, 2.0 * np.pi, n)
    shift = rng.uniform(-max_shift, max_shift, (n, 2))   # (x, y) pixels
    images = np.zeros((n, image_dim, image_dim), np.uint8)
    off = (image_dim - STAMP) // 2
    for i in range(n):
        canvas = np.zeros((image_dim, image_dim), np.float32)
        stamp = draw_sprite(shape[i])
        if scale[i] != 1.0:
            z = ndimage.zoom(stamp, scale[i], order=1)
            z = z[:STAMP, :STAMP]
            pad = [(0, STAMP - z.shape[0]), (0, STAMP - z.shape[1])]
            z = np.pad(z, pad)
            # re-center the zoomed sprite
            sh = (STAMP - scale[i] * STAMP) / 2.0
            stamp = ndimage.shift(z, (sh, sh), order=1, mode="constant")
        canvas[off:off + STAMP, off:off + STAMP] = stamp
        rot = ndimage.rotate(canvas, -np.degrees(theta[i]), reshape=False,
                             order=1, mode="constant")
        moved = ndimage.shift(rot, (-shift[i, 1], shift[i, 0]), order=1,
                              mode="constant")
        images[i] = (moved > 0.5).astype(np.uint8)
    # dSprites latents_values columns: color, shape, scale, orientation,
    # posX, posY (positions normalized to [0, 1] like the real dataset)
    latents = np.stack([
        np.ones(n, np.float32),
        shape.astype(np.float32),
        scale.astype(np.float32),
        theta.astype(np.float32),
        (0.5 + shift[:, 0] / image_dim).astype(np.float32),
        (0.5 + shift[:, 1] / image_dim).astype(np.float32),
    ], axis=1)
    return images, latents


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-root", default="data/dsprites-dataset-master")
    ap.add_argument("--n-train", type=int, default=4000)
    ap.add_argument("--n-test", type=int, default=1000)
    ap.add_argument("--image-dim", type=int, default=64)
    ap.add_argument("--max-shift", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    scales = np.array([0.8, 0.9, 1.0], np.float32)
    os.makedirs(args.out_root, exist_ok=True)
    for split, n in [("train", args.n_train), ("test", args.n_test)]:
        images, latents = make_split(n, args.image_dim, args.max_shift,
                                     scales, rng)
        np.save(os.path.join(args.out_root, f"imgs_{split}.npy"), images)
        np.save(os.path.join(args.out_root, f"latent_{split}.npy"), latents)
        print(f"# wrote {n} {split} dsprites images (3 shape classes)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
