"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetvae_tpu.models import TargetVAE
from targetvae_tpu.parallel import make_mesh
from targetvae_tpu.parallel.pjit import shard_batch, shard_state
from targetvae_tpu.train import Trainer
from targetvae_tpu.utils.config import (
    EncoderConfig, GeneratorConfig, LikelihoodConfig, ModelConfig, TrainConfig)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _model():
    return TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=64, num_layers=2,
                        fourier_expansion=True, fourier_sigma=0.1),
        EncoderConfig(image_dim=16, z_dim=2, kernels_num=32, kernels_size=9,
                      padding=4, groupconv=4),
        LikelihoodConfig()))


def test_dp_tp_step_matches_single_device():
    """One sharded train step must match the unsharded step numerically."""
    model = _model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    y = jax.random.uniform(jax.random.key(1), (16, 16, 16, 1))

    state0 = trainer.init_state(0)
    _, m_single = trainer._train_step(state0, y)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    state1 = shard_state(mesh, trainer.init_state(0))
    ys, _ = shard_batch(mesh, y)
    _, m_sharded = jax.jit(trainer._step_impl)(state1, ys)

    np.testing.assert_allclose(np.asarray(m_single), np.asarray(m_sharded),
                               rtol=2e-4, atol=1e-3)


def test_param_shardings_applied():
    model = _model()
    trainer = Trainer(model, TrainConfig())
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    state = shard_state(mesh, trainer.init_state(0))
    spec = state.params["encoder"]["conv1"]["w"].sharding.spec
    assert spec == jax.sharding.PartitionSpec("model")
    spec = state.params["generator"]["hidden"][0]["w"].sharding.spec
    assert spec == jax.sharding.PartitionSpec("model", None)
    # Adam moments follow the same layout
    mu = state.opt_state.inner_state[0].mu
    assert mu["encoder"]["conv1"]["w"].sharding.spec == \
        jax.sharding.PartitionSpec("model")


def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
    g.dryrun_multichip(2)


def test_data_parallel_epoch():
    """Trainer epoch with data sharded over all 8 devices (pure DP)."""
    model = _model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3,
                                         minibatch_size=16))
    mesh = make_mesh(jax.devices()[:8], data=8, model=1)
    state = shard_state(mesh, trainer.init_state(0))
    data = jax.device_put(
        jax.random.uniform(jax.random.key(1), (64, 16, 16, 1)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    state, (elbo, gen_loss, kl) = trainer.train_epoch(state, data)
    assert np.isfinite(elbo)
