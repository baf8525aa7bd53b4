"""Grid-sharded posterior ops vs single-device references (8 CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetvae_tpu.parallel.grid_softmax import make_sharded_posterior
from targetvae_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_posterior_matches_reference():
    mesh = make_mesh(jax.devices()[:8], data=1, model=8)
    B, M, D = 4, 64 * 8, 3
    attn = jax.random.normal(jax.random.key(0), (B, M)) * 3.0
    z = jax.random.normal(jax.random.key(1), (B, M, D))
    key = jax.random.key(2)

    fn = make_sharded_posterior(mesh)
    q, a, ez = fn(attn, key, z)

    # q must equal the global log_softmax exactly
    q_ref = jax.nn.log_softmax(attn, axis=-1)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), atol=1e-5)

    # a is a valid distribution over the full grid
    np.testing.assert_allclose(np.asarray(jnp.sum(a, axis=-1)), 1.0,
                               atol=1e-5)
    # moments consistent with the sample it returned
    ez_ref = jnp.einsum("bm,bmd->bd", a, z)
    np.testing.assert_allclose(np.asarray(ez), np.asarray(ez_ref), atol=1e-5)


def test_sharded_posterior_grad_flows():
    mesh = make_mesh(jax.devices()[:8], data=1, model=8)
    B, M = 2, 16 * 8
    attn = jax.random.normal(jax.random.key(0), (B, M))
    z = jax.random.normal(jax.random.key(1), (B, M, 2))
    fn = make_sharded_posterior(mesh)

    def loss(attn):
        q, a, ez = fn(attn, jax.random.key(2), z)
        return jnp.sum(q * jnp.exp(q)) + jnp.sum(ez ** 2)

    g = jax.grad(loss)(attn)
    assert np.isfinite(np.asarray(g)).all()
