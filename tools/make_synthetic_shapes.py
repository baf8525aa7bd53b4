#!/usr/bin/env python
"""Synthetic shapes dataset in the MNIST-U or MNIST-N layout, for end-to-end
quality validation without external data: K distinct shape classes drawn on a
28x28 stamp, rotated/translated onto an image_dim canvas with recorded
ground-truth poses. Writes images_{train,test}.npy, transforms_{split}.npy,
labels_{split}.npy under <out-root>/mnist_U/ (or mnist_N/ with
--dataset mnist-N, which draws theta ~ N(0, pi/4)), plus the untransformed
mnist_{split}.npy canvases used by the clustering reference-frame pass.

Theta draws come from a SEPARATE RNG stream so that mnist-U and mnist-N
generations at the same seed produce byte-identical instances (labels,
dilation, shifts) and therefore byte-identical plain canvases — mirroring
how the real MNIST variants share one plain MNIST. Without this, generating
the second variant would silently overwrite the shared mnist_{split}.npy
with canvases that no longer index-align with the first variant's images,
corrupting the clustering CLI's per-image reference-frame correction.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from scipy import ndimage


def draw_shape(cls: int, rng) -> np.ndarray:
    s = np.zeros((28, 28), np.float32)
    c = 14
    if cls == 0:      # filled square
        s[c - 6:c + 6, c - 6:c + 6] = 1
    elif cls == 1:    # cross
        s[c - 9:c + 9, c - 2:c + 2] = 1
        s[c - 2:c + 2, c - 9:c + 9] = 1
    elif cls == 2:    # ring
        yy, xx = np.mgrid[:28, :28]
        r = np.sqrt((yy - c) ** 2 + (xx - c) ** 2)
        s[(r > 5) & (r < 9)] = 1
    elif cls == 3:    # L-shape
        s[c - 9:c + 9, c - 7:c - 2] = 1
        s[c + 4:c + 9, c - 7:c + 8] = 1
    elif cls == 4:    # two dots
        s[c - 8:c - 2, c - 8:c - 2] = 1
        s[c + 2:c + 8, c + 2:c + 8] = 1
    elif cls == 5:    # triangle
        for i in range(12):
            s[c - 6 + i, c - i // 2 - 1:c + i // 2 + 1] = 1
    else:             # bar
        s[c - 2:c + 2, c - 10:c + 10] = 1
    # small per-instance thickness jitter
    if rng.rand() < 0.5:
        s = ndimage.grey_dilation(s, size=2)
    return s * 255.0


def make_split(n, k_classes, image_dim, max_shift, rng, theta_rng,
               theta_sigma=None):
    labels = rng.randint(0, k_classes, n)
    if theta_sigma is None:            # MNIST-U convention: uniform rotations
        thetas = theta_rng.uniform(-np.pi, np.pi, n)
    else:                              # MNIST-N convention: theta ~ N(0, s)
        thetas = theta_rng.normal(0.0, theta_sigma, n)
    shifts = rng.uniform(-max_shift, max_shift, (n, 2))
    images = np.zeros((n, image_dim, image_dim), np.uint8)
    plain = np.zeros((n, image_dim, image_dim), np.uint8)
    off = (image_dim - 28) // 2
    for i in range(n):
        canvas = np.zeros((image_dim, image_dim), np.float32)
        canvas[off:off + 28, off:off + 28] = draw_shape(labels[i], rng)
        plain[i] = np.clip(canvas, 0, 255).astype(np.uint8)
        rot = ndimage.rotate(canvas, -np.degrees(thetas[i]), reshape=False,
                             order=1, mode="constant")
        shifted = ndimage.shift(rot, (-shifts[i, 1], shifts[i, 0]), order=1,
                                mode="constant")
        images[i] = np.clip(shifted, 0, 255).astype(np.uint8)
    transforms = np.concatenate([thetas[:, None], shifts], 1).astype(np.float32)
    return images, plain, transforms, labels


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-root", default="data")
    ap.add_argument("--n-train", type=int, default=4000)
    ap.add_argument("--n-test", type=int, default=1000)
    ap.add_argument("--classes", type=int, default=5)
    ap.add_argument("--image-dim", type=int, default=50)
    ap.add_argument("--max-shift", type=float, default=8.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset", choices=["mnist-U", "mnist-N"],
                    default="mnist-U",
                    help="mnist-N draws rotations from N(0, pi/4) — the "
                         "dataset the reference's Normal rotation prior "
                         "targets (train_mnist.py:538-543) — and writes "
                         "the mnist_N/ layout")
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    theta_rng = np.random.RandomState(args.seed + 100003)
    sub = "mnist_N" if args.dataset == "mnist-N" else "mnist_U"
    theta_sigma = np.pi / 4 if args.dataset == "mnist-N" else None
    out = os.path.join(args.out_root, sub)
    os.makedirs(out, exist_ok=True)
    for split, n in [("train", args.n_train), ("test", args.n_test)]:
        images, plain, transforms, labels = make_split(
            n, args.classes, args.image_dim, args.max_shift, rng, theta_rng,
            theta_sigma=theta_sigma)
        np.save(os.path.join(out, f"images_{split}.npy"), images)
        np.save(os.path.join(out, f"transforms_{split}.npy"), transforms)
        np.save(os.path.join(out, f"labels_{split}.npy"), labels)
        np.save(os.path.join(args.out_root, f"mnist_{split}.npy"), plain)
        print(f"# wrote {n} {split} images ({args.classes} classes)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
