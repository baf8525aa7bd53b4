"""Host data pipeline + streaming trainer path."""

import numpy as np
import jax.numpy as jnp

from targetvae_tpu.data.pipeline import HostDataPipeline
from targetvae_tpu.models import TargetVAE
from targetvae_tpu.train import Trainer
from targetvae_tpu.utils.config import (
    EncoderConfig, GeneratorConfig, LikelihoodConfig, ModelConfig, TrainConfig)


def test_pipeline_covers_epoch():
    images = np.random.RandomState(0).rand(53, 8, 8, 1).astype(np.float32)
    pipe = HostDataPipeline(images, batch_size=16, seed=1)
    seen = 0
    batches = list(pipe.epoch(0))
    sizes = [int(y.shape[0]) for y, _ in batches]
    assert sum(sizes) == 53
    assert sizes[:-1] == [16, 16, 16] and sizes[-1] == 5
    # shuffling differs between epochs
    b0 = np.asarray(list(pipe.epoch(0))[0][0])
    b1 = np.asarray(list(pipe.epoch(1))[0][0])
    assert not np.allclose(b0, b1)


def test_streaming_train_epoch():
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32),
        EncoderConfig(image_dim=12, z_dim=2, kernels_num=16, kernels_size=7,
                      padding=2, groupconv=4),
        LikelihoodConfig()))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3,
                                         minibatch_size=16))
    state = trainer.init_state(0)
    images = np.zeros((48, 12, 12, 1), np.float32)
    rng = np.random.RandomState(0)
    for i in range(48):
        cx, cy = rng.randint(3, 9, 2)
        images[i, cy - 2:cy + 2, cx - 2:cx + 2, 0] = 1.0
    pipe = HostDataPipeline(images, batch_size=16, seed=0)
    first = None
    for ep in range(4):
        state, (elbo, gen_loss, kl) = trainer.train_epoch_stream(
            state, pipe.epoch(ep))
        if first is None:
            first = elbo
    assert elbo > first
    assert int(state.step) == 4 * 3
