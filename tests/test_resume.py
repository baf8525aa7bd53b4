"""Checkpoint-resume: training continues bit-compatibly from a saved state."""

import os

import numpy as np
import jax
import pytest

from targetvae_tpu.cli import train_mnist


def _mk_data(data_root, d=12):
    rng = np.random.RandomState(0)
    def blobs(n, seed):
        r = np.random.RandomState(seed)
        ys = np.zeros((n, d, d), np.uint8)
        for i in range(n):
            cx, cy = r.randint(3, d - 3, 2)
            ys[i, cy - 2:cy + 2, cx - 2:cx + 2] = 255
        return ys
    os.makedirs(os.path.join(data_root, "mnist_U"), exist_ok=True)
    np.save(os.path.join(data_root, "mnist_U", "images_train.npy"), blobs(40, 0))
    np.save(os.path.join(data_root, "mnist_U", "images_test.npy"), blobs(20, 1))


ARGS = ["--dataset", "mnist-U", "--image-dim", "12", "--z-dim", "2",
        "--groupconv", "4", "--encoder-kernel-number", "16",
        "--encoder-kernel-size", "8", "--encoder-padding", "2",
        "--generator-hidden-dim", "32", "--minibatch-size", "20", "-d", "-1"]


def test_cli_resume_continues(tmp_path):
    data_root = str(tmp_path / "data")
    _mk_data(data_root)

    # run A: 4 epochs straight through
    log_a = str(tmp_path / "logs_a")
    train_mnist.main(ARGS + ["--data-root", data_root, "--log-root", log_a,
                             "--num-epochs", "4", "--seed", "7"])
    run_a = os.path.join(log_a, os.listdir(log_a)[0])

    # run B: 2 epochs, then resume for 2 more
    log_b = str(tmp_path / "logs_b")
    train_mnist.main(ARGS + ["--data-root", data_root, "--log-root", log_b,
                             "--num-epochs", "2", "--seed", "7"])
    run_b = os.path.join(log_b, os.listdir(log_b)[0])
    train_mnist.main(ARGS + ["--data-root", data_root, "--log-root", log_b,
                             "--num-epochs", "4", "--seed", "7",
                             "--resume", run_b])

    def tsv(run):
        rows = {}
        for line in open(os.path.join(run, "train_log.txt")):
            parts = line.strip().split("\t")
            if len(parts) == 5 and parts[1] in ("train", "test"):
                rows[(int(parts[0]), parts[1])] = float(parts[2])
        return rows

    a, b = tsv(run_a), tsv(run_b)
    assert (4, "train") in b and (4, "test") in b
    # epochs 3-4 of the resumed run must match the uninterrupted run closely
    for key in [(3, "train"), (4, "train"), (3, "test"), (4, "test")]:
        np.testing.assert_allclose(b[key], a[key], rtol=1e-5)
