#!/usr/bin/env python
"""Synthetic Galaxy-Zoo-style RGB dataset for end-to-end quality validation
of the galaxy vertical without external data (zero egress). Mirrors the file
layout `cli/train_galaxy.py` / `cli/clustering_galaxy.py` expect (reference
train_galaxy.py:286-291): uint8 RGB 64x64 stacks galaxy_zoo_{train,test}.npy,
values 0..255 (loaded with scale255=True).

Five morphology classes with distinct color/structure so an unsupervised
z-space clustering has ground truth to recover (the reference pipeline has no
labels — clustering_galaxy.py colors its z-scatter by cluster id — so class
labels are written to galaxy_labels_{split}.npy for offline Hungarian
scoring): red smooth elliptical, blue disk + bright core, two-arm spiral,
edge-on disk, merging pair. Uniform ground-truth rotations and +-6 px
translations, mild per-pixel noise.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from scipy import ndimage


def draw_galaxy(cls: int, rng) -> np.ndarray:
    """One RGB galaxy on a 64x64 canvas, centered, float 0..1."""
    d = 64
    c = d / 2.0 - 0.5
    yy, xx = np.mgrid[:d, :d].astype(np.float32)
    r2a = ((yy - c) / 14.0) ** 2 + ((xx - c) / 14.0) ** 2
    img = np.zeros((d, d, 3), np.float32)
    if cls == 0:      # smooth red elliptical
        e = ((yy - c) / 16.0) ** 2 + ((xx - c) / 10.0) ** 2
        g = np.exp(-e * 2.0)
        img[..., 0] = g * 1.0
        img[..., 1] = g * 0.55
        img[..., 2] = g * 0.35
    elif cls == 1:    # blue disk with a bright yellow core
        g = np.exp(-r2a * 2.5)
        core = np.exp(-r2a * 40.0)
        img[..., 0] = g * 0.35 + core * 0.9
        img[..., 1] = g * 0.45 + core * 0.9
        img[..., 2] = g * 0.95 + core * 0.4
    elif cls == 2:    # two-arm spiral (theta-modulated disk)
        rr = np.sqrt((yy - c) ** 2 + (xx - c) ** 2) + 1e-6
        ang = np.arctan2(yy - c, xx - c)
        arm = 0.5 + 0.5 * np.cos(2.0 * ang - 0.45 * rr)
        g = np.exp(-(rr / 16.0) ** 2) * (0.35 + 0.65 * arm)
        img[..., 0] = g * 0.75
        img[..., 1] = g * 0.8
        img[..., 2] = g * 0.95
    elif cls == 3:    # edge-on disk (thin bright bar + dust lane)
        e = ((yy - c) / 2.6) ** 2 + ((xx - c) / 17.0) ** 2
        g = np.exp(-e)
        lane = np.exp(-(((yy - c - 1.2) / 1.0) ** 2
                        + ((xx - c) / 17.0) ** 2))
        img[..., 0] = g * 0.95 - lane * 0.35
        img[..., 1] = g * 0.85 - lane * 0.35
        img[..., 2] = g * 0.6 - lane * 0.2
    else:             # merging pair (two offset blobs, one redder)
        r2b = ((yy - c - 7.0) / 7.0) ** 2 + ((xx - c - 6.0) / 7.0) ** 2
        r2c = ((yy - c + 7.0) / 8.0) ** 2 + ((xx - c + 6.0) / 8.0) ** 2
        g1, g2 = np.exp(-r2b * 1.5), np.exp(-r2c * 1.5)
        img[..., 0] = g1 * 0.95 + g2 * 0.5
        img[..., 1] = g1 * 0.6 + g2 * 0.6
        img[..., 2] = g1 * 0.4 + g2 * 0.9
    # per-instance brightness jitter
    img *= rng.uniform(0.8, 1.0)
    return np.clip(img, 0.0, 1.0)


def make_split(n, max_shift, noise, rng):
    labels = rng.randint(0, 5, n)
    theta = rng.uniform(0.0, 2.0 * np.pi, n)
    shift = rng.uniform(-max_shift, max_shift, (n, 2))
    images = np.zeros((n, 64, 64, 3), np.uint8)
    for i in range(n):
        img = draw_galaxy(labels[i], rng)
        rot = ndimage.rotate(img, -np.degrees(theta[i]), axes=(0, 1),
                             reshape=False, order=1, mode="constant")
        moved = ndimage.shift(rot, (-shift[i, 1], shift[i, 0], 0.0), order=1,
                              mode="constant")
        moved += rng.normal(0.0, noise, moved.shape).astype(np.float32)
        images[i] = np.clip(moved * 255.0, 0, 255).astype(np.uint8)
    transforms = np.concatenate([theta[:, None], shift], 1).astype(np.float32)
    return images, labels, transforms


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-root", default="data/galaxy_zoo")
    ap.add_argument("--n-train", type=int, default=4000)
    ap.add_argument("--n-test", type=int, default=1000)
    ap.add_argument("--max-shift", type=float, default=6.0)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out_root, exist_ok=True)
    for split, n in [("train", args.n_train), ("test", args.n_test)]:
        images, labels, transforms = make_split(n, args.max_shift,
                                                args.noise, rng)
        np.save(os.path.join(args.out_root, f"galaxy_zoo_{split}.npy"), images)
        np.save(os.path.join(args.out_root, f"galaxy_labels_{split}.npy"),
                labels)
        np.save(os.path.join(args.out_root, f"galaxy_transforms_{split}.npy"),
                transforms)
        print(f"# wrote {n} {split} galaxy images (5 classes)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
