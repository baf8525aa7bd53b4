"""End-to-end CLI tests: fabricate tiny datasets, run the train CLIs through
their argparse surface, then the clustering CLIs on the produced checkpoints."""

import os

import numpy as np
import pytest

from targetvae_tpu.cli import (train_mnist, train_dsprites, train_galaxy,
                               train_particles, clustering_mnist,
                               clustering_particles)
from targetvae_tpu.data import mrc


def _blobs(n, d, channels=1, seed=0, binary=True):
    rng = np.random.RandomState(seed)
    ys = np.zeros((n, d, d) if channels == 1 else (n, d, d, channels),
                  np.float32)
    for i in range(n):
        cx, cy = rng.randint(3, d - 3, 2)
        if channels == 1:
            ys[i, cy - 2:cy + 2, cx - 2:cx + 2] = 255.0
        else:
            ys[i, cy - 2:cy + 2, cx - 2:cx + 2, :] = 255.0
    return ys.astype(np.uint8) if binary else ys


COMMON = ["--z-dim", "2", "--groupconv", "4", "--encoder-kernel-number", "16",
          "--encoder-kernel-size", "8", "--encoder-padding", "2",
          "--generator-hidden-dim", "32", "--num-epochs", "2",
          "--minibatch-size", "25", "-d", "-1"]


def test_train_and_cluster_mnist(tmp_path):
    d = 14
    data_root = tmp_path / "data"
    (data_root / "mnist_U").mkdir(parents=True)
    np.save(data_root / "mnist_U" / "images_train.npy", _blobs(50, d))
    np.save(data_root / "mnist_U" / "images_test.npy", _blobs(100, d, seed=1))
    np.save(data_root / "mnist_U" / "transforms_test.npy",
            np.random.RandomState(2).randn(100, 3).astype(np.float32))
    np.save(data_root / "mnist_test.npy", _blobs(100, d, seed=1))
    labels = np.random.RandomState(3).randint(0, 10, 100)
    np.save(data_root / "labels.npy", labels)

    log_root = str(tmp_path / "logs")
    train_mnist.main(["--dataset", "mnist-U", "--image-dim", str(d),
                      "--data-root", str(data_root), "--log-root", log_root]
                     + COMMON)

    runs = os.listdir(log_root)
    assert len(runs) == 1
    run = os.path.join(log_root, runs[0])
    assert os.path.exists(os.path.join(run, "inference.sav"))
    log = open(os.path.join(run, "train_log.txt")).read()
    assert log.count("\ttrain\t") == 2 and log.count("\ttest\t") == 2

    clustering_mnist.main([
        "--dataset", "mnist-U", "--image-dim", str(d),
        "--data-root", str(data_root),
        "--path-to-encoder", os.path.join(run, "inference.sav"),
        "--path-to-labels", str(data_root / "labels.npy"),
        "-d", "-1"])
    results = open(os.path.join(run, "results.txt")).read()
    assert "accuracy for clustering" in results
    assert "circular correlation" in results
    assert os.path.exists(os.path.join(run, "tsne.jpg"))
    assert os.path.exists(os.path.join(run, "confusion_matrix.jpg"))


def test_train_and_cluster_particles(tmp_path):
    d = 14
    stack = np.random.RandomState(0).randn(60, d, d).astype(np.float32)
    mrc.write(str(tmp_path / "stack.mrcs"), stack)
    ctf_rows = ["1.5 2.7 300 1.2 100 10 0 0"] * 60
    (tmp_path / "ctf.txt").write_text("\n".join(ctf_rows))

    log_root = str(tmp_path / "logs")
    train_particles.main(["--train-path", str(tmp_path / "stack.mrcs"),
                          "--ctf-train", str(tmp_path / "ctf.txt"),
                          "--train-portion", "0.75",
                          "--mask-radius", "5", "--fit-noise",
                          "--log-root", log_root] + COMMON)
    runs = os.listdir(log_root)
    run = os.path.join(log_root, runs[0])
    assert "_ctf" in runs[0]
    log = open(os.path.join(run, "train_log.txt")).read()
    assert "\ttrain\t" in log
    metric_lines = [l for l in log.splitlines()
                    if "\ttrain\t" in l or "\ttest\t" in l]
    assert metric_lines and all("nan" not in l for l in metric_lines)

    clustering_particles.main([
        "--test-path", str(tmp_path / "stack.mrcs"),
        "--path-to-encoder", os.path.join(run, "inference.sav"),
        "--n-clusters", "3", "-d", "-1"])
    assert os.path.exists(os.path.join(run, "cluster_assignments.npy"))
    assert os.path.exists(os.path.join(run, "rotation_hist.jpg"))


def test_train_dsprites_smoke(tmp_path):
    d = 14
    np.save(tmp_path / "train.npy", (_blobs(40, d) > 0).astype(np.uint8))
    np.save(tmp_path / "test.npy", (_blobs(20, d, seed=1) > 0).astype(np.uint8))
    log_root = str(tmp_path / "logs")
    train_dsprites.main(["--train-path", str(tmp_path / "train.npy"),
                         "--test-path", str(tmp_path / "test.npy"),
                         "--image-dim", str(d), "--log-root", log_root,
                         "--num-epochs", "1"] + COMMON[:-4] + ["-d", "-1",
                         "--minibatch-size", "20"])
    runs = os.listdir(log_root)
    assert any("dsprites" in r for r in runs)


def test_train_galaxy_smoke(tmp_path):
    d = 14
    np.save(tmp_path / "train.npy", _blobs(40, d, channels=3))
    np.save(tmp_path / "test.npy", _blobs(20, d, channels=3, seed=1))
    log_root = str(tmp_path / "logs")
    train_galaxy.main(["--train-path", str(tmp_path / "train.npy"),
                       "--test-path", str(tmp_path / "test.npy"),
                       "--image-dim", str(d), "--log-root", log_root,
                       "--num-epochs", "1"] + COMMON[:-4] + ["-d", "-1",
                       "--minibatch-size", "20"])
    runs = os.listdir(log_root)
    run = os.path.join(log_root, runs[0])
    assert os.path.exists(os.path.join(run, "generator.sav"))


def test_cluster_dsprites(tmp_path):
    from targetvae_tpu.cli import clustering_dsprites
    d = 14
    imgs = (_blobs(60, d) > 0).astype(np.uint8)
    np.save(tmp_path / "imgs_train.npy", imgs[:40])
    np.save(tmp_path / "imgs_test.npy", imgs[40:])
    lat = np.random.RandomState(0).rand(60, 6).astype(np.float32)
    lat[:, 1] = np.random.RandomState(1).randint(0, 3, 60)
    np.save(tmp_path / "lat_train.npy", lat[:40])
    np.save(tmp_path / "lat_test.npy", lat[40:])

    log_root = str(tmp_path / "logs")
    train_dsprites.main(["--train-path", str(tmp_path / "imgs_train.npy"),
                         "--test-path", str(tmp_path / "imgs_test.npy"),
                         "--image-dim", str(d), "--log-root", log_root,
                         "--num-epochs", "1"] + COMMON[:-4]
                        + ["-d", "-1", "--minibatch-size", "20"])
    run = os.path.join(log_root, os.listdir(log_root)[0])
    clustering_dsprites.main([
        "--train-path", str(tmp_path / "imgs_train.npy"),
        "--test-path", str(tmp_path / "imgs_test.npy"),
        "--train-labels", str(tmp_path / "lat_train.npy"),
        "--test-labels", str(tmp_path / "lat_test.npy"),
        "--path-to-encoder", os.path.join(run, "inference.sav"),
        "--n-clusters", "3", "--minibatch-size", "30", "-d", "-1"])
    results = open(os.path.join(run, "results.txt")).read()
    assert "accuracy for clustering" in results


def test_cluster_galaxy(tmp_path):
    from targetvae_tpu.cli import clustering_galaxy
    d = 14
    imgs = _blobs(60, d, channels=3)
    np.save(tmp_path / "g_train.npy", imgs[:40])
    np.save(tmp_path / "g_test.npy", imgs[40:])
    log_root = str(tmp_path / "logs")
    train_galaxy.main(["--train-path", str(tmp_path / "g_train.npy"),
                       "--test-path", str(tmp_path / "g_test.npy"),
                       "--image-dim", str(d), "--log-root", log_root,
                       "--num-epochs", "1"] + COMMON[:-4]
                      + ["-d", "-1", "--minibatch-size", "20"])
    run = os.path.join(log_root, os.listdir(log_root)[0])
    clustering_galaxy.main([
        "--train-path", str(tmp_path / "g_train.npy"),
        "--test-path", str(tmp_path / "g_test.npy"),
        "--path-to-encoder", os.path.join(run, "inference.sav"),
        "--n-clusters", "3", "--minibatch-size", "30", "-d", "-1"])
    assert os.path.exists(os.path.join(run, "tsne.jpg"))
    assert os.path.exists(os.path.join(run, "z_vals.jpg"))


def test_train_cli_mesh_dp_tp(tmp_path):
    """--dp/--tp CLI wiring: train on a 4-device ('data','model') mesh
    (2x2 over the virtual CPU devices from conftest), then resume on it."""
    d = 14
    data_root = tmp_path / "data"
    (data_root / "mnist_U").mkdir(parents=True)
    np.save(data_root / "mnist_U" / "images_train.npy", _blobs(48, d))
    np.save(data_root / "mnist_U" / "images_test.npy", _blobs(24, d, seed=1))

    log_root = str(tmp_path / "logs")
    args = ["--dataset", "mnist-U", "--image-dim", str(d),
            "--data-root", str(data_root), "--log-root", log_root,
            "--z-dim", "2", "--groupconv", "4",
            "--encoder-kernel-number", "16", "--encoder-kernel-size", "8",
            "--encoder-padding", "2", "--generator-hidden-dim", "32",
            "--num-epochs", "2", "--minibatch-size", "24", "-d", "-1",
            "--dp", "2", "--tp", "2"]
    train_mnist.main(args)

    runs = os.listdir(log_root)
    run = os.path.join(log_root, runs[0])
    log = open(os.path.join(run, "train_log.txt")).read()
    assert "# mesh: data=2 model=2 (4 devices)" in log
    assert log.count("\ttrain\t") == 2
    for line in log.splitlines():
        if "\ttrain\t" in line or "\ttest\t" in line:
            vals = [float(v) for v in line.split("\t")[2:]]
            assert all(np.isfinite(vals)), line

    # resume keeps the mesh path working
    train_mnist.main(args + ["--resume", run, "--num-epochs", "3"])
    log = open(os.path.join(run, "train_log.txt")).read()
    assert log.count("\ttrain\t") == 3


def test_train_cli_host_stream(tmp_path):
    """--host-stream: train batches streamed from host RAM (threaded
    shuffle/gather/prefetch), alone and combined with a DP mesh."""
    d = 14
    data_root = tmp_path / "data"
    (data_root / "mnist_U").mkdir(parents=True)
    np.save(data_root / "mnist_U" / "images_train.npy", _blobs(48, d))
    np.save(data_root / "mnist_U" / "images_test.npy", _blobs(24, d, seed=1))

    base = ["--dataset", "mnist-U", "--image-dim", str(d),
            "--data-root", str(data_root),
            "--z-dim", "2", "--groupconv", "4",
            "--encoder-kernel-number", "16", "--encoder-kernel-size", "8",
            "--encoder-padding", "2", "--generator-hidden-dim", "32",
            "--num-epochs", "2", "--minibatch-size", "24", "-d", "-1",
            "--host-stream"]
    # bf16wire also makes the epoch RAGGED (48 % 20 = tail 8): the CLI-level
    # zero-weight tail padding + half-width wire in one pass
    for extra, name in (([], "plain"), (["--dp", "2"], "dp2"),
                        (["--stream-bf16", "--minibatch-size", "20"],
                         "bf16wire")):
        log_root = str(tmp_path / f"logs_{name}")
        train_mnist.main(base + ["--log-root", log_root] + extra)
        run = os.path.join(log_root, os.listdir(log_root)[0])
        log = open(os.path.join(run, "train_log.txt")).read()
        assert "# host-streaming train data (48 images; test 24)" in log
        if name == "bf16wire":
            assert "(bf16 wire)" in log
        assert log.count("\ttrain\t") == 2
        for line in log.splitlines():
            if "\ttrain\t" in line:
                vals = [float(v) for v in line.split("\t")[2:]]
                assert all(np.isfinite(vals)), line
        if name == "plain":
            # resume continues a streamed run (the pipeline's shuffle is
            # seed+epoch-deterministic, so epoch 3 draws the right order)
            train_mnist.main(base + ["--log-root", log_root,
                                     "--resume", run, "--num-epochs", "3"])
            log = open(os.path.join(run, "train_log.txt")).read()
            assert log.count("\ttrain\t") == 3


def test_train_particles_downsample(tmp_path):
    """--downsample bins the stack (Fourier crop) before training and scales
    the CTF pixel size; the run dir reflects the binned image size and the
    clustering CLI reproduces the binning for evaluation."""
    d, d_small = 20, 14
    stack = np.random.RandomState(2).randn(40, d, d).astype(np.float32)
    mrc.write(str(tmp_path / "stack.mrcs"), stack)
    ctf_rows = ["1.5 2.7 300 1.2 100 10 0 0"] * 40
    (tmp_path / "ctf.txt").write_text("\n".join(ctf_rows))

    log_root = str(tmp_path / "logs")
    train_particles.main(["--train-path", str(tmp_path / "stack.mrcs"),
                          "--ctf-train", str(tmp_path / "ctf.txt"),
                          "--downsample", str(d_small),
                          "--train-portion", "0.75",
                          "--log-root", log_root] + COMMON)
    runs = os.listdir(log_root)
    run = os.path.join(log_root, runs[0])
    log = open(os.path.join(run, "train_log.txt")).read()
    assert f"{d_small}x{d_small}" in log or "\ttrain\t" in log
    metric_lines = [l for l in log.splitlines()
                    if "\ttrain\t" in l or "\ttest\t" in l]
    assert metric_lines and all("nan" not in l for l in metric_lines)
    # checkpoint config carries the binned image size
    from targetvae_tpu.train.checkpoint import load_checkpoint
    _, cfg, _ = load_checkpoint(os.path.join(run, "inference.sav"))
    assert cfg.encoder.image_dim == d_small

    clustering_particles.main([
        "--test-path", str(tmp_path / "stack.mrcs"),
        "--downsample", str(d_small),
        "--path-to-encoder", os.path.join(run, "inference.sav"),
        "--n-clusters", "3", "-d", "-1"])
    assert os.path.exists(os.path.join(run, "cluster_assignments.npy"))


def test_embed_stack_tool(tmp_path):
    """tools/embed_stack.py: MRC stack -> latent/pose npys through a trained
    checkpoint (the standalone serving path, no clustering)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "embed_stack", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "embed_stack.py"))
    embed_stack = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(embed_stack)

    d = 14
    stack = np.random.RandomState(0).randn(40, d, d).astype(np.float32)
    mrc.write(str(tmp_path / "stack.mrcs"), stack)

    log_root = str(tmp_path / "logs")
    train_particles.main(["--train-path", str(tmp_path / "stack.mrcs"),
                          "--train-portion", "0.75",
                          "--log-root", log_root, "--num-epochs", "1"]
                         + COMMON[:-4] + ["-d", "-1",
                                          "--minibatch-size", "20"])
    run = os.path.join(log_root, os.listdir(log_root)[0])

    out = str(tmp_path / "latents" / "run1")
    embed_stack.main(["--input", str(tmp_path / "stack.mrcs"),
                      "--path-to-encoder", os.path.join(run, "inference.sav"),
                      "--out", out, "--normalize",
                      "--compute-dtype", "float32",
                      "--minibatch-size", "16", "-d", "-1"])
    z = np.load(out + "_z.npy")
    rot = np.load(out + "_rot.npy")
    tr = np.load(out + "_trans.npy")
    assert z.shape == (40, 4) and rot.shape == (40, 1) and tr.shape == (40, 2)
    assert np.isfinite(z).all() and np.isfinite(rot).all() \
        and np.isfinite(tr).all()
