"""End-to-end ELBO parity vs the reference eval_minibatch.

Strategy: copy reference-module weights into our params, zero all sampling
noise on both sides (torch Tensor.normal_, Normal.sample, gumbel noise ->
plain softmax; jax.random.normal -> zeros, gumbel_softmax -> softmax), then
the full (elbo, log_p, kl) triple must agree to float32 tolerance. This pins
every term of SURVEY.md section 2.5 in one assertion per mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import targetvae_tpu.models.encoders as enc_mod
from targetvae_tpu.losses.elbo import compute_elbo
from targetvae_tpu.ops.coords import image_grid
from targetvae_tpu.utils.config import (
    EncoderConfig, GeneratorConfig, LikelihoodConfig, ModelConfig)
from tests.conftest import requires_reference
from tests.helpers import (
    encoder_params_from_torch, generator_params_from_torch,
    import_reference_models, import_reference_module)


@pytest.fixture
def deterministic_noise(monkeypatch):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from torch.distributions.normal import Normal

    monkeypatch.setattr(torch.Tensor, "normal_",
                        lambda self, *a, **k: self.zero_())
    monkeypatch.setattr(
        Normal, "sample",
        lambda self, shape=torch.Size(): torch.zeros(
            tuple(shape) + tuple(self.loc.shape)))
    monkeypatch.setattr(
        torch.nn.functional, "gumbel_softmax",
        lambda logits, tau=1.0, hard=False, dim=-1:
            F.softmax(logits / tau, dim=dim))

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        enc_mod, "gumbel_softmax",
        lambda key, logits, tau=1.0, axis=-1: jax.nn.softmax(logits, axis=axis))
    return None


def _build_pair(mode, d=14, zd=2, R=4, ks=8, pad=3, theta_prior=np.pi,
                normal_prior_over_r=False, r_inf=None, groupconv=None,
                n_out=1, fourier=False, in_channels=1):
    torch = pytest.importorskip("torch")
    ref_models = import_reference_models()
    torch.manual_seed(0)

    gc = R if groupconv is None else groupconv
    gen_t = ref_models.SpatialGenerator(zd, 32, n_out=n_out, num_layers=2,
                                        fourier_expansion=fourier,
                                        sigma=2.0 / (d - 1))
    if mode == "A":
        t_inf = r_inf_ = "unimodal"
        enc_t = ref_models.InferenceNetwork_UnimodalTranslation_UnimodalRotation(
            d * d, zd + 3, 24, num_layers=2)
    elif mode == "B":
        t_inf, r_inf_ = "attention", "unimodal"
        enc_t = ref_models.InferenceNetwork_AttentionTranslation_UnimodalRotation(
            d, in_channels, zd, kernels_num=16, groupconv=gc)
    else:
        t_inf = "attention"
        r_inf_ = r_inf or "attention+offsets"
        enc_t = ref_models.InferenceNetwork_AttentionTranslation_AttentionRotation(
            d, in_channels, zd, kernels_num=16, kernels_size=ks, padding=pad,
            groupconv=gc, rot_refinement=(r_inf_ == "attention+offsets"),
            theta_prior=theta_prior, normal_prior_over_r=normal_prior_over_r)

    cfg = ModelConfig(
        generator=GeneratorConfig(z_dim=zd, hidden_dim=32, n_out=n_out,
                                  num_layers=2, fourier_expansion=fourier,
                                  fourier_sigma=2.0 / (d - 1)),
        encoder=EncoderConfig(t_inf=t_inf, r_inf=r_inf_, image_dim=d,
                              in_channels=in_channels, z_dim=zd, kernels_num=16
                              if mode != "A" else 24, kernels_size=ks,
                              padding=pad, num_layers=2, groupconv=gc,
                              theta_prior=theta_prior,
                              normal_prior_over_r=normal_prior_over_r),
        likelihood=LikelihoodConfig())
    params = {
        "generator": jax.tree.map(jnp.asarray, generator_params_from_torch(gen_t)),
        "encoder": jax.tree.map(jnp.asarray,
                                encoder_params_from_torch(enc_t, mode)),
    }
    return gen_t, enc_t, cfg, params, t_inf, r_inf_


@requires_reference
@pytest.mark.parametrize("mode,r_inf,extra", [
    ("A", None, {}),
    ("B", None, {"groupconv": 0}),
    ("B", None, {"groupconv": 4}),
    ("C", "attention+offsets", {}),
    ("C", "attention", {}),
    ("C", "attention+offsets", {"normal_prior_over_r": True,
                                "theta_prior": np.pi / 4}),
    ("C", "attention+offsets", {"fourier": True}),
])
def test_elbo_parity(mode, r_inf, extra, deterministic_noise):
    torch = pytest.importorskip("torch")
    ref_train = import_reference_module("train_mnist")

    d = 14
    gen_t, enc_t, cfg, params, t_inf, r_inf_ = _build_pair(
        mode, d=d, r_inf=r_inf, **extra)

    rng = np.random.RandomState(3)
    y = (rng.rand(5, d, d, 1) > 0.5).astype(np.float32)
    x_coord = torch.from_numpy(image_grid(d).copy())
    y_t = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)).copy())

    elbo_r, logp_r, kl_r = ref_train.eval_minibatch(
        x_coord, y_t, gen_t, enc_t, t_inf, r_inf_, 0, torch.device("cpu"),
        cfg.encoder.theta_prior, cfg.encoder.groupconv, d)

    elbo_m, logp_m, kl_m = compute_elbo(
        params, cfg, jnp.asarray(image_grid(d)), jnp.asarray(y),
        jax.random.key(0))

    np.testing.assert_allclose(float(logp_m), float(logp_r), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(kl_m), float(kl_r), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(elbo_m), float(elbo_r), rtol=2e-4, atol=4e-3)


@requires_reference
@pytest.mark.parametrize("use_ctf,mask_radius", [(False, 0), (True, 0),
                                                 (False, 4), (True, 4)])
def test_elbo_parity_particles(use_ctf, mask_radius, deterministic_noise):
    """Gaussian likelihood + CTF + circular mask vs train_particles."""
    torch = pytest.importorskip("torch")
    ref_train = import_reference_module("train_particles")
    import pandas as pd
    from targetvae_tpu.data.ctf import ctf_filter, CTF_COLUMNS

    d = 14
    gen_t, enc_t, cfg, params, t_inf, r_inf_ = _build_pair("C", d=d)
    cfg = ModelConfig(cfg.generator, cfg.encoder,
                      LikelihoodConfig(kind="gaussian", mask_radius=mask_radius,
                                       use_ctf=use_ctf))

    rng = np.random.RandomState(4)
    y = rng.randn(5, d, d, 1).astype(np.float32)
    ctf_t = ctf_j = None
    if use_ctf:
        cp = pd.DataFrame([[1.5, 2.7, 300, 1.2, 100, 10, 0, 0]] * 5,
                          columns=CTF_COLUMNS)
        kern = ctf_filter(cp, d - 1, d - 1)
        ctf_t = torch.from_numpy(kern[:, None]).float()
        ctf_j = jnp.asarray(kern)

    x_coord = torch.from_numpy(image_grid(d).copy())
    y_t = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)).copy())

    elbo_r, logp_r, kl_r = ref_train.eval_minibatch(
        x_coord, y_t, ctf_t, gen_t, enc_t, t_inf, r_inf_, 0,
        torch.device("cpu"), cfg.encoder.theta_prior, cfg.encoder.groupconv,
        cfg.encoder.padding, mask_radius)

    elbo_m, logp_m, kl_m = compute_elbo(
        params, cfg, jnp.asarray(image_grid(d)), jnp.asarray(y),
        jax.random.key(0), ctf=ctf_j)

    np.testing.assert_allclose(float(logp_m), float(logp_r), rtol=2e-4, atol=5e-3)
    np.testing.assert_allclose(float(kl_m), float(kl_r), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(elbo_m), float(elbo_r), rtol=2e-4, atol=5e-3)


def test_posterior_normalization():
    """logsumexp of the joint posterior must be 0 (src/models.py:383)."""
    cfg = ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=16),
        EncoderConfig(image_dim=10, z_dim=2, kernels_num=8, kernels_size=5,
                      padding=2, groupconv=4),
        LikelihoodConfig())
    from targetvae_tpu.models import TargetVAE
    m = TargetVAE(cfg)
    p = m.init(jax.random.key(0))
    y = jax.random.uniform(jax.random.key(1), (3, 10, 10, 1))
    out = enc_mod.encoder_apply(p["encoder"], cfg.encoder, y, jax.random.key(2))
    lse = jax.scipy.special.logsumexp(out["q"].reshape(3, -1), axis=1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-5)
    # KL must be >= 0
    e, lp, kl = m.elbo(p, m.base_grid(), y, jax.random.key(3))
    assert float(kl) >= 0.0


@requires_reference
def test_training_dynamics_parity(deterministic_noise):
    """Optimizer-in-the-loop parity: starting from copied weights and feeding
    identical batches (noise zeroed on both sides), six Adam steps here and
    six torch.optim.Adam steps on the reference (train_mnist.py:320-324)
    must trace the same per-step ELBO trajectory. Pins gradient + update
    equivalence end to end, not just the forward loss."""
    torch = pytest.importorskip("torch")
    ref_train = import_reference_module("train_mnist")
    from targetvae_tpu.train.state import make_optimizer

    d = 14
    gen_t, enc_t, cfg, params, t_inf, r_inf_ = _build_pair("C", d=d)

    rng = np.random.RandomState(5)
    batches = [(rng.rand(5, d, d, 1) > 0.5).astype(np.float32)
               for _ in range(6)]
    lr = 1e-3

    x_t = torch.from_numpy(image_grid(d).copy())
    opt_t = torch.optim.Adam(list(gen_t.parameters())
                             + list(enc_t.parameters()), lr=lr)
    ref_elbos = []
    for y in batches:
        y_t = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)).copy())
        elbo, _, _ = ref_train.eval_minibatch(
            x_t, y_t, gen_t, enc_t, t_inf, r_inf_, 0, torch.device("cpu"),
            cfg.encoder.theta_prior, cfg.encoder.groupconv, d)
        opt_t.zero_grad()
        (-elbo).backward()
        opt_t.step()
        ref_elbos.append(float(elbo))

    opt = make_optimizer(lr)
    opt_state = opt.init(params)
    x_j = jnp.asarray(image_grid(d))
    our_elbos = []
    for y in batches:
        def loss_fn(p):
            elbo, _, _ = compute_elbo(p, cfg, x_j, jnp.asarray(y),
                                      jax.random.key(0))
            return -elbo
        neg, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, b: a + b, params, updates)
        our_elbos.append(-float(neg))

    np.testing.assert_allclose(our_elbos, ref_elbos, rtol=5e-4, atol=5e-3)


@requires_reference
def test_training_dynamics_parity_particles(deterministic_noise):
    """Same optimizer-in-the-loop trajectory check for the cryo-EM path:
    gaussian likelihood + per-particle CTF conv + circular mask. Pins that
    the mask cuts gradients exactly where the reference's host round-trip
    does (train_particles.py:318-323 — our mask is device-side but
    stop_gradient'ed, losses/likelihoods.py:107)."""
    torch = pytest.importorskip("torch")
    ref_train = import_reference_module("train_particles")
    import pandas as pd
    from targetvae_tpu.data.ctf import CTF_COLUMNS, ctf_filter
    from targetvae_tpu.train.state import make_optimizer

    d = 14
    mask_radius = 4
    gen_t, enc_t, cfg, params, t_inf, r_inf_ = _build_pair("C", d=d)
    cfg = ModelConfig(cfg.generator, cfg.encoder,
                      LikelihoodConfig(kind="gaussian",
                                       mask_radius=mask_radius, use_ctf=True))

    rng = np.random.RandomState(6)
    batches = [rng.randn(5, d, d, 1).astype(np.float32) for _ in range(4)]
    cp = pd.DataFrame([[1.5, 2.7, 300, 1.2, 100, 10, 0.3, 20]] * 5,
                      columns=CTF_COLUMNS)
    kern = ctf_filter(cp, d - 1, d - 1)
    ctf_t = torch.from_numpy(kern[:, None]).float()
    ctf_j = jnp.asarray(kern)
    lr = 1e-3

    x_t = torch.from_numpy(image_grid(d).copy())
    opt_t = torch.optim.Adam(list(gen_t.parameters())
                             + list(enc_t.parameters()), lr=lr)
    ref_elbos = []
    for y in batches:
        y_t = torch.from_numpy(np.transpose(y, (0, 3, 1, 2)).copy())
        elbo, _, _ = ref_train.eval_minibatch(
            x_t, y_t, ctf_t, gen_t, enc_t, t_inf, r_inf_, 0,
            torch.device("cpu"), cfg.encoder.theta_prior,
            cfg.encoder.groupconv, cfg.encoder.padding, mask_radius)
        opt_t.zero_grad()
        (-elbo).backward()
        opt_t.step()
        ref_elbos.append(float(elbo))

    opt = make_optimizer(lr)
    opt_state = opt.init(params)
    x_j = jnp.asarray(image_grid(d))
    our_elbos = []
    for y in batches:
        def loss_fn(p):
            elbo, _, _ = compute_elbo(p, cfg, x_j, jnp.asarray(y),
                                      jax.random.key(0), ctf=ctf_j)
            return -elbo
        neg, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, b: a + b, params, updates)
        our_elbos.append(-float(neg))

    np.testing.assert_allclose(our_elbos, ref_elbos, rtol=5e-4, atol=1e-2)
