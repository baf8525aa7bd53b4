"""Dataset loading for the training/clustering CLIs.

Mirrors the reference loaders (train_mnist.py:440-470, train_dsprites.py:436,
train_galaxy.py:438-442, train_particles.py:454-475) with the same default
paths, returning channels-last (N, H, W, C) float32 arrays. Adds what the
reference is missing: directory-of-mrcs support (README.md:47-49 advertises it
but load_images cannot do it) and memory-mapped MRC reads.
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

import numpy as np

from . import mrc
from .image import crop as crop_fn, normalize as normalize_fn


def _to_nhwc(arr: np.ndarray, in_channels: int = 1) -> np.ndarray:
    if arr.ndim == 3:
        arr = arr[..., None]
    if arr.ndim == 4 and arr.shape[-1] != in_channels and arr.shape[1] == in_channels:
        arr = np.transpose(arr, (0, 2, 3, 1))
    return np.ascontiguousarray(arr, dtype=np.float32)


def load_mnist(dataset: str, image_dim: int, data_root: str = "data",
               split: str = "train") -> np.ndarray:
    """mnist | mnist-U | mnist-N -> (N, image_dim, image_dim, 1) in [0, 1]."""
    if dataset == "mnist":
        arr = _load_plain_mnist(image_dim, data_root, split)
    elif dataset in ("mnist-U", "mnist-N"):
        sub = "mnist_U" if dataset == "mnist-U" else "mnist_N"
        arr = np.load(os.path.join(data_root, sub, f"images_{split}.npy"))
    else:
        raise ValueError(f"unknown mnist variant: {dataset}")
    return _to_nhwc(arr.astype(np.float32) / 255.0)


def _load_plain_mnist(image_dim: int, data_root: str, split: str) -> np.ndarray:
    """Plain MNIST centered on an image_dim canvas (reference uses torchvision
    with its own resize-on-access; we accept either a torchvision cache or a
    raw npy `mnist_{split}.npy`)."""
    npy = os.path.join(data_root, f"mnist_{split}.npy")
    if os.path.exists(npy):
        digits = np.load(npy)
    else:
        try:
            import torchvision
            ds = torchvision.datasets.MNIST(data_root, train=(split == "train"),
                                            download=True)
            digits = np.stack([np.array(img, copy=False) for img, _ in ds])
        except Exception as e:  # pragma: no cover
            raise FileNotFoundError(
                f"no {npy} and torchvision MNIST unavailable: {e}")
    if digits.shape[-1] == image_dim:
        return digits
    # center-pad the 28x28 digits onto the canvas
    out = np.zeros((len(digits), image_dim, image_dim), dtype=digits.dtype)
    off = (image_dim - digits.shape[-1]) // 2
    out[:, off:off + digits.shape[-2], off:off + digits.shape[-1]] = digits
    return out


def load_npy_split(train_path: str, test_path: str, scale255: bool = True,
                   limit: Optional[Tuple[int, int]] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Generic npy pair loader (dsprites/galaxy)."""
    tr = np.load(train_path)
    te = np.load(test_path)
    if limit is not None:
        tr = tr[:limit[0]]
        te = te[:limit[1]]
    tr = tr.astype(np.float32)
    te = te.astype(np.float32)
    if scale255:
        tr /= 255.0
        te /= 255.0
    return _to_nhwc(tr, tr.shape[-1] if tr.ndim == 4 else 1), \
        _to_nhwc(te, te.shape[-1] if te.ndim == 4 else 1)


def load_particles(path: str) -> np.ndarray:
    """Load a particle stack: .mrc/.mrcs/.npy file, or a directory of mrcs
    (the README-advertised layout the reference does not actually support)."""
    def _load_one(p: str) -> np.ndarray:
        from . import native
        if native.available():
            return native.load_mrc_f32(p)   # mmap + multithreaded decode
        arr, _ = mrc.read_mmap(p)
        return np.asarray(arr, dtype=np.float32)

    if os.path.isdir(path):
        stacks = [
            _load_one(os.path.join(path, name))
            for name in sorted(os.listdir(path))
            if name.endswith((".mrc", ".mrcs"))
        ]
        if not stacks:
            raise FileNotFoundError(f"no .mrc/.mrcs files in {path}")
        images = np.concatenate(stacks, axis=0)
    elif path.endswith((".mrc", ".mrcs")):
        images = _load_one(path)
    elif path.endswith(".npy"):
        images = np.load(path).astype(np.float32)
    else:
        raise ValueError(f"unrecognized particle stack: {path}")
    if images.ndim == 2:
        images = images[None]
    return images


def preprocess_particles(images: np.ndarray, crop: int = 0,
                         normalize: bool = False) -> np.ndarray:
    """Center-crop + per-image standardization (train_particles.py:584-600 —
    the reference standardizes inline with plain mean/std, not the ring
    normalize; we match that)."""
    if crop > 0:
        images = crop_fn(images, crop)
    if normalize:
        mu = images.mean(axis=(-2, -1), keepdims=True)
        std = images.std(axis=(-2, -1), keepdims=True)
        images = (images - mu) / std
    return images


def train_test_split(images: np.ndarray, train_portion: float
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Leading-split by portion (train_particles.py:553-559: first
    floor(N*portion) images are train)."""
    n_train = int(len(images) * train_portion)
    return images[:n_train], images[n_train:]
