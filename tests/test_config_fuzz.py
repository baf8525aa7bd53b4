"""Config-space robustness: random valid (encoder, generator, likelihood)
combinations must produce finite ELBO and gradients. Guards the corners no
targeted test pins (odd dims x priors x likelihood heads x resid/fourier),
the way the reference's 4x copy-pasted eval_minibatch made every new combo
a fresh hazard."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetvae_tpu.models import TargetVAE
from targetvae_tpu.utils.config import (
    EncoderConfig, GeneratorConfig, LikelihoodConfig, ModelConfig)


def _random_config(rng):
    mode = rng.choice(["A", "B", "C"])
    d = int(rng.choice([11, 12, 14]))
    zd = int(rng.choice([2, 4]))
    groupconv = 0
    if mode != "A":
        groupconv = int(rng.choice([0, 4] if mode == "B" else [4, 8]))
    kind = rng.choice(["bernoulli", "gaussian"])
    fit_noise = bool(kind == "gaussian" and rng.rand() < 0.5)
    like = LikelihoodConfig(
        kind=str(kind), fit_noise=fit_noise,
        mask_radius=int(rng.choice([0, d // 2 - 1])),
        use_ctf=False)
    n_out = 2 if fit_noise else 1
    t_inf = "unimodal" if mode == "A" else "attention"
    r_inf = ("unimodal" if mode in ("A", "B")
             else str(rng.choice(["attention", "attention+offsets"])))
    return ModelConfig(
        generator=GeneratorConfig(
            z_dim=zd, hidden_dim=int(rng.choice([16, 32])), n_out=n_out,
            num_layers=int(rng.choice([1, 2])),
            fourier_expansion=bool(rng.rand() < 0.5), fourier_sigma=0.1,
            resid=bool(rng.rand() < 0.3)),
        encoder=EncoderConfig(
            t_inf=t_inf, r_inf=r_inf, image_dim=d, in_channels=1, z_dim=zd,
            kernels_num=8, kernels_size=int(rng.choice([5, 7])),
            padding=2, num_layers=2, groupconv=groupconv,
            theta_prior=float(rng.choice([np.pi, np.pi / 4])),
            normal_prior_over_r=bool(rng.rand() < 0.5)),
        likelihood=like)


@pytest.mark.parametrize("seed", range(8))
def test_random_config_elbo_and_grads_finite(seed):
    rng = np.random.RandomState(seed)
    cfg = _random_config(rng)
    model = TargetVAE(cfg)
    params = model.init(jax.random.key(seed))
    d = cfg.encoder.image_dim
    y = jnp.asarray(rng.rand(5, d, d, 1).astype(np.float32))

    def loss(p):
        elbo, log_p, kl = model.elbo(p, model.base_grid(), y,
                                     jax.random.key(seed + 1))
        return -elbo, (log_p, kl)

    (neg, (log_p, kl)), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(neg)), cfg
    assert np.isfinite(float(log_p)) and np.isfinite(float(kl)), cfg
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert bool(jnp.isfinite(g).all()), (cfg, path)
