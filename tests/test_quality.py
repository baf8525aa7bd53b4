"""End-to-end quality regression: unsupervised clustering on synthetic data.

A CPU-budget version of the QUALITY.md protocol (itself modeled on the
reference's clustering evaluation, clustering_mnist.py:356-366): train the
full mode-C model on rotation-DISTINCT shape classes (disk / hollow frame /
plus sign — rotated copies of one class never look like another, unlike
bars, which the rotation-invariant content latent must merge), then the
clustering handoff (model.embed -> KMeans -> Hungarian accuracy) must
recover the classes. Guards the whole train->embed->cluster chain against
silent quality regressions, not just numerics.
"""

import numpy as np
import jax.numpy as jnp

from targetvae_tpu.cli.clustering_common import cluster_acc
from targetvae_tpu.models import TargetVAE
from targetvae_tpu.train import Trainer
from targetvae_tpu.utils.config import (EncoderConfig, GeneratorConfig,
                                        LikelihoodConfig, ModelConfig,
                                        TrainConfig)

D = 16


def _make(rng, n):
    xs, ys = [], []
    yy, xx = np.mgrid[:D, :D]
    for i in range(n):
        c = i % 3
        img = np.zeros((D, D), np.float32)
        cy, cx = rng.randint(6, D - 6, 2)
        if c == 0:                      # disk
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 9] = 1.0
        elif c == 1:                    # hollow frame
            img[cy - 4:cy + 4, cx - 4:cx + 4] = 1.0
            img[cy - 2:cy + 2, cx - 2:cx + 2] = 0.0
        else:                           # plus sign
            img[cy - 4:cy + 4, cx - 1:cx + 1] = 1.0
            img[cy - 1:cy + 1, cx - 4:cx + 4] = 1.0
        img = np.rot90(img, rng.randint(0, 4)).copy()
        xs.append(img)
        ys.append(c)
    return np.stack(xs)[..., None], np.array(ys)


def test_unsupervised_clustering_recovers_classes():
    from sklearn.cluster import KMeans

    rng = np.random.RandomState(0)
    train_x, _ = _make(rng, 120)
    test_x, test_y = _make(rng, 90)

    cfg = ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=64, num_layers=2,
                        fourier_expansion=True, fourier_sigma=2.0 / (D - 1)),
        EncoderConfig(image_dim=D, z_dim=2, kernels_num=32, kernels_size=9,
                      padding=4, groupconv=4),
        LikelihoodConfig())
    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=2e-3,
                                         minibatch_size=30))
    state = trainer.init_state(0)
    data = jnp.asarray(train_x)
    first = None
    for _ in range(20):
        state, (elbo, _, _) = trainer.train_epoch(state, data)
        first = elbo if first is None else first
    assert elbo > first + 10, (first, elbo)   # training actually learned

    z = np.asarray(model.embed(state.params, jnp.asarray(test_x))["z_content"])
    pred = KMeans(3, n_init=20, random_state=0).fit_predict(z)
    _, acc = cluster_acc(test_y, pred)
    assert acc >= 0.95, acc


def test_rotation_disentanglement_pose_correlation():
    """Pose-quality guard: train on continuously rotated copies of one
    strongly asymmetric shape; the predicted per-image theta must track the
    true rotation angle (|Fisher-Lee circular correlation| >= 0.9 — the
    metric of the reference's measure_correlations,
    clustering_mnist.py:194-213; the SIGN depends only on the generator's
    angle convention vs scipy's, so the magnitude is asserted)."""
    from scipy.ndimage import rotate as ndrotate

    from targetvae_tpu.cli.clustering_common import circular_corrcoef

    rng = np.random.RandomState(1)
    yy, xx = np.mgrid[:D, :D]
    base = np.zeros((D, D), np.float32)
    base[(yy - 8) ** 2 + (xx - 8) ** 2 <= 6] = 1.0   # disk...
    base[7:10, 8:15] = 1.0                           # ...plus bar: lollipop

    def make(n):
        xs, angs = [], []
        for _ in range(n):
            a = 45.0 * rng.randint(0, 8)   # the P8 group angles
            img = ndrotate(base, a, reshape=False, order=1, mode="constant")
            xs.append(np.clip(img, 0, 1))
            angs.append(np.deg2rad(a))
        return (np.stack(xs)[..., None].astype(np.float32), np.array(angs))

    train_x, _ = make(150)
    test_x, test_a = make(80)

    cfg = ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=64, num_layers=2,
                        fourier_expansion=True, fourier_sigma=2.0 / (D - 1)),
        EncoderConfig(image_dim=D, z_dim=2, kernels_num=32, kernels_size=9,
                      padding=4, groupconv=8),
        LikelihoodConfig())
    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=3e-3,
                                         minibatch_size=30))
    state = trainer.init_state(0)
    data = jnp.asarray(train_x)
    for _ in range(30):
        state, _ = trainer.train_epoch(state, data)

    theta = np.asarray(
        model.embed(state.params, jnp.asarray(test_x))["theta_mu"]).ravel()
    corr = circular_corrcoef(theta, test_a)
    assert abs(corr) >= 0.9, corr


def test_ctf_particles_clustering_recovers_classes():
    """Cryo-EM-path quality guard (CPU-budget version of QUALITY.md's
    synthetic EMPIAR stand-in, VERDICT r2 #4): heterogeneous classes,
    per-particle CTF corruption with a defocus spread (applied as the exact
    linear convolution with data/ctf.ctf_filter kernels — what the
    gaussian+CTF likelihood inverts, reference train_particles.py:284-341),
    additive noise at SNR 2, per-image standardization, circular mask — the
    clustering handoff must still recover the classes.

    apix is 10 A: a 16-px stand-in box must cover the same PHYSICAL box as
    a real particle (110 px x 1.5 A ~ 165 A); at the full-image apix 1.5
    the CTF oscillates several times across the 8 radial frequency samples
    and scrambles the toy images into unclusterability (measured acc 0.5
    even noise-free) — exactly why real processing bins particles.
    """
    import pandas as pd
    from sklearn.cluster import KMeans

    from targetvae_tpu.data.ctf import CTF_COLUMNS, ctf_filter

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[:D, :D]

    def render(cls):
        img = np.zeros((D, D), np.float32)
        cy, cx = rng.randint(6, D - 6, 2)
        if cls == 0:                    # disk
            img[(yy - cy) ** 2 + (xx - cx) ** 2 <= 9] = 1.0
        elif cls == 1:                  # hollow frame
            img[cy - 4:cy + 4, cx - 4:cx + 4] = 1.0
            img[cy - 2:cy + 2, cx - 2:cx + 2] = 0.0
        else:                           # plus sign
            img[cy - 4:cy + 4, cx - 1:cx + 1] = 1.0
            img[cy - 1:cy + 1, cx - 4:cx + 4] = 1.0
        return np.rot90(img, rng.randint(0, 4)).copy()

    def make(n):
        labels = rng.randint(0, 3, n)
        clean = np.stack([render(labels[i]) for i in range(n)])
        params = pd.DataFrame(
            [[rng.uniform(1.0, 2.5), 2.7, 300.0, 10.0, 0.0, 7.0, 0.0,
              rng.uniform(0, 360)] for _ in range(n)],
            columns=CTF_COLUMNS)
        kerns = np.asarray(ctf_filter(params, D - 1, D - 1))
        s = 2 * D - 2
        full = np.fft.irfft2(np.fft.rfft2(clean, s=(s, s))
                             * np.fft.rfft2(kerns, s=(s, s)), s=(s, s))
        o = (D - 2) // 2
        sig = full[:, o:o + D, o:o + D].astype(np.float32)
        sig = sig + rng.randn(*sig.shape).astype(np.float32) * np.sqrt(
            sig.var(axis=(1, 2), keepdims=True) / 2.0)          # SNR 2
        im = (sig - sig.mean(axis=(1, 2), keepdims=True)) / sig.std(
            axis=(1, 2), keepdims=True)
        return im[..., None].astype(np.float32), kerns, labels

    train_x, train_k, _ = make(150)
    test_x, _, test_y = make(90)

    cfg = ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=64, num_layers=2,
                        fourier_expansion=True, fourier_sigma=2.0 / (D - 1)),
        EncoderConfig(image_dim=D, z_dim=2, kernels_num=32, kernels_size=9,
                      padding=4, groupconv=4),
        LikelihoodConfig(kind="gaussian", use_ctf=True, mask_radius=7))
    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=2e-3,
                                         minibatch_size=30))
    state = trainer.init_state(0)
    data = jnp.asarray(train_x)
    ctf = jnp.asarray(train_k)
    first = None
    for _ in range(30):
        state, (elbo, _, _) = trainer.train_epoch(state, data, ctf=ctf)
        first = elbo if first is None else first
    assert np.isfinite(elbo)
    assert elbo > first, (first, elbo)

    z = np.asarray(model.embed(state.params, jnp.asarray(test_x))["z_content"])
    pred = KMeans(3, n_init=20, random_state=0).fit_predict(z)
    _, acc = cluster_acc(test_y, pred)
    assert acc >= 0.95, acc
