"""Gaussian KL / log-prob helpers with the reference's NaN guards.

normal_kl matches torch.distributions.kl_divergence(Normal, Normal);
guarded_moments replicates the torch.where guards at reference
train_mnist.py:154-163, 245-254 which zero the posterior moments wherever
exp(q) underflows to 0 so that 0 * KL stays 0 instead of 0 * inf = NaN.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_LOG_2PI = float(np.log(2.0 * np.pi))


def normal_log_prob(x: jnp.ndarray, mu, std) -> jnp.ndarray:
    """log N(x; mu, std), elementwise (torch Normal.log_prob semantics)."""
    mu = jnp.asarray(mu, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return -0.5 * _LOG_2PI - jnp.log(std) - 0.5 * ((x - mu) / std) ** 2


def normal_kl(mu_q: jnp.ndarray, std_q: jnp.ndarray, mu_p, std_p) -> jnp.ndarray:
    """KL(N(mu_q, std_q) || N(mu_p, std_p)), elementwise."""
    mu_p = jnp.asarray(mu_p, dtype=mu_q.dtype)
    std_p = jnp.asarray(std_p, dtype=mu_q.dtype)
    var_ratio = (std_q / std_p) ** 2
    t1 = ((mu_q - mu_p) / std_p) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def guarded_moments(q_log: jnp.ndarray, mu: jnp.ndarray, std: jnp.ndarray):
    """Where exp(q_log) == 0, replace (mu, std) by (0, 1).

    q_log broadcasts against mu/std. Mirrors reference train_mnist.py:154-163.
    """
    dead = jnp.exp(q_log) == 0.0
    mu = jnp.where(dead, jnp.zeros_like(mu), mu)
    std = jnp.where(dead, jnp.ones_like(std), std)
    return mu, std
