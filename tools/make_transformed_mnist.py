#!/usr/bin/env python
"""Generate the MNIST-U / MNIST-N datasets the reference trains on.

The reference expects data/mnist_U/images_{train,test}.npy (+
transforms_test.npy with columns [theta, tx, ty]) but ships no generator.
This tool builds them from plain MNIST digits: each 28x28 digit is rotated
(uniform in [-pi, pi] for mnist-U, Normal(0, pi/4) for mnist-N — the priors
the reference assumes per dataset, train_mnist.py:538-543), translated
uniformly within the canvas margin, and composited onto an image_dim canvas.

Usage:
  python tools/make_transformed_mnist.py --dataset mnist-U \
      --mnist-train mnist_train.npy --mnist-test mnist_test.npy \
      --out-root data [--image-dim 50] [--max-shift 10]

The digit inputs are (N, 28, 28) uint8 npy arrays (export from any MNIST
copy); torchvision is used as a fallback source when available.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from scipy import ndimage


def load_digits(path: str, split: str):
    if path and os.path.exists(path):
        return np.load(path)
    try:
        import torchvision
        ds = torchvision.datasets.MNIST("data/", train=(split == "train"),
                                        download=True)
        return np.stack([np.array(img, copy=False) for img, _ in ds]), \
            np.array([lbl for _, lbl in ds])
    except Exception as e:
        raise SystemExit(f"no digit npy at {path} and torchvision MNIST "
                         f"unavailable: {e}")


def transform_digits(digits: np.ndarray, image_dim: int, thetas: np.ndarray,
                     shifts: np.ndarray) -> np.ndarray:
    n = len(digits)
    out = np.zeros((n, image_dim, image_dim), dtype=np.uint8)
    off = (image_dim - digits.shape[-1]) // 2
    for i in range(n):
        canvas = np.zeros((image_dim, image_dim), dtype=np.float32)
        canvas[off:off + digits.shape[-2], off:off + digits.shape[-1]] = \
            digits[i]
        # rotate about the center (degrees, counter-clockwise), then shift
        rot = ndimage.rotate(canvas, -np.degrees(thetas[i]), reshape=False,
                             order=1, mode="constant")
        # image row axis is y-descending: +ty moves the object up
        shifted = ndimage.shift(rot, (-shifts[i, 1], shifts[i, 0]), order=1,
                                mode="constant")
        out[i] = np.clip(shifted, 0, 255).astype(np.uint8)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["mnist-U", "mnist-N"],
                    default="mnist-U")
    ap.add_argument("--mnist-train", default="data/mnist_train.npy")
    ap.add_argument("--mnist-test", default="data/mnist_test.npy")
    ap.add_argument("--out-root", default="data")
    ap.add_argument("--image-dim", type=int, default=50)
    ap.add_argument("--max-shift", type=float, default=10.0,
                    help="max |translation| in pixels (default 10)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--limit", type=int, default=0,
                    help="only transform the first N digits (0 = all)")
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    sub = "mnist_U" if args.dataset == "mnist-U" else "mnist_N"
    out_dir = os.path.join(args.out_root, sub)
    os.makedirs(out_dir, exist_ok=True)

    for split, path in [("train", args.mnist_train), ("test", args.mnist_test)]:
        loaded = load_digits(path, split)
        digits = loaded[0] if isinstance(loaded, tuple) else loaded
        if args.limit:
            digits = digits[:args.limit]
        n = len(digits)
        if args.dataset == "mnist-U":
            thetas = rng.uniform(-np.pi, np.pi, n)
        else:
            thetas = rng.normal(0.0, np.pi / 4, n)
        shifts = rng.uniform(-args.max_shift, args.max_shift, (n, 2))
        images = transform_digits(digits, args.image_dim, thetas, shifts)
        np.save(os.path.join(out_dir, f"images_{split}.npy"), images)
        transforms = np.concatenate([thetas[:, None], shifts], axis=1)
        np.save(os.path.join(out_dir, f"transforms_{split}.npy"),
                transforms.astype(np.float32))
        if isinstance(loaded, tuple):
            np.save(os.path.join(out_dir, f"labels_{split}.npy"), loaded[1][:n]
                    if args.limit else loaded[1])
        print(f"# wrote {n} {split} images to {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
