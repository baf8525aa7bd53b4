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


def test_pipeline_multihost_path():
    """multihost=True on a single process: the local rows are ALL rows, the
    global array is assembled with make_array_from_process_local_data, and the
    result equals the plain device_put path batch for batch."""
    from targetvae_tpu.parallel import make_mesh
    from targetvae_tpu.parallel.mesh import batch_sharding

    images = np.random.RandomState(0).rand(40, 8, 8, 1).astype(np.float32)
    ctf = np.random.RandomState(1).rand(40, 8, 8).astype(np.float32)
    mesh = make_mesh(data=8, model=1)
    sh = batch_sharding(mesh)
    plain = HostDataPipeline(images, ctf, batch_size=16, seed=3, sharding=sh,
                             multihost=False)
    multi = HostDataPipeline(images, ctf, batch_size=16, seed=3, sharding=sh,
                             multihost=True)
    got_p = list(plain.epoch(0))
    got_m = list(multi.epoch(0))
    # multihost drops the uneven trailing 8-row batch
    assert len(got_p) == 3 and len(got_m) == 2
    for (yp, cp), (ym, cm) in zip(got_p, got_m):
        assert ym.sharding.is_equivalent_to(sh, ym.ndim)
        np.testing.assert_array_equal(np.asarray(yp), np.asarray(ym))
        np.testing.assert_array_equal(np.asarray(cp), np.asarray(cm))


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
