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
    batches = list(pipe.epoch(0))
    # every batch arrives at the fixed size; the ragged tail is zero-weight
    # padded (drop_last=False semantics: all 53 rows are real data)
    assert [int(b.y.shape[0]) for b in batches] == [16, 16, 16, 16]
    assert [b.n_real for b in batches] == [16, 16, 16, 5]
    for b in batches[:-1]:   # full batches: uniform weights (one step shape)
        np.testing.assert_allclose(np.asarray(b.w), 1.0 / 16)
    tail_w = np.asarray(batches[-1].w)
    np.testing.assert_allclose(tail_w[:5], 1.0 / 5)
    np.testing.assert_array_equal(tail_w[5:], 0.0)
    # pad rows are wrap-around repeats of the tail's real rows
    tail_y = np.asarray(batches[-1].y)
    np.testing.assert_array_equal(tail_y[5:10], tail_y[:5])
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
    # the zero-weight tail padding keeps the trailing 8-row batch's split
    # even, so multihost processes it too (nothing dropped)
    assert len(got_p) == 3 and len(got_m) == 3
    for (yp, cp, wp, np_r), (ym, cm, wm, nm_r) in zip(got_p, got_m):
        assert ym.sharding.is_equivalent_to(sh, ym.ndim)
        assert np_r == nm_r
        np.testing.assert_array_equal(np.asarray(yp), np.asarray(ym))
        np.testing.assert_array_equal(np.asarray(cp), np.asarray(cm))
        np.testing.assert_array_equal(np.asarray(wp), np.asarray(wm))
    # tail: 8 real rows at weight 1/8, 8 zero-weight pads, on both paths
    tail = got_m[-1]
    assert tail.n_real == 8 and int(tail.y.shape[0]) == 16
    tw = np.asarray(tail.w)
    np.testing.assert_allclose(tw[:8], 1.0 / 8)
    np.testing.assert_array_equal(tw[8:], 0.0)


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


def test_pipeline_bf16_wire():
    """wire_dtype='bfloat16' stages half-width batches; a train step on them
    matches the f32-wire step to bf16 rounding (VERDICT r4 #1)."""
    import jax

    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32),
        EncoderConfig(image_dim=12, z_dim=2, kernels_num=16, kernels_size=7,
                      padding=2, groupconv=4),
        LikelihoodConfig()))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3,
                                         minibatch_size=16))
    images = np.random.RandomState(0).rand(16, 12, 12, 1).astype(np.float32)
    f32 = list(HostDataPipeline(images, batch_size=16, seed=0).epoch(0))
    bf16 = list(HostDataPipeline(images, batch_size=16, seed=0,
                                 wire_dtype="bfloat16").epoch(0))
    assert f32[0].y.dtype == jnp.float32
    assert bf16[0].y.dtype == jnp.bfloat16
    # same rows, just rounded on the wire
    np.testing.assert_allclose(
        np.asarray(bf16[0].y, np.float32), np.asarray(f32[0].y),
        rtol=8e-3, atol=4e-3)

    state = trainer.init_state(0)
    _, m_f = trainer._train_step(state, f32[0].y, None, f32[0].w)
    state2 = trainer.init_state(0)
    _, m_b = trainer._train_step(state2, bf16[0].y, None, bf16[0].w)
    m_f, m_b = np.asarray(m_f), np.asarray(m_b)
    assert np.all(np.isfinite(m_b)), m_b
    np.testing.assert_allclose(m_b, m_f, rtol=0.05, atol=0.5)


def test_streaming_eval_epoch():
    """eval_epoch_stream (shuffle=False pipeline) agrees with the
    device-resident eval_epoch on a ragged dataset — same data, same
    weighted drop_last=False metrics, sampling keys drawn per-batch."""
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32),
        EncoderConfig(image_dim=12, z_dim=2, kernels_num=16, kernels_size=7,
                      padding=2, groupconv=4),
        LikelihoodConfig()))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3,
                                         minibatch_size=16))
    state = trainer.init_state(0)
    images = np.random.RandomState(3).rand(53, 12, 12, 1).astype(np.float32)

    resident = trainer.eval_epoch(state, jnp.asarray(images), seed=0)
    pipe = HostDataPipeline(images, batch_size=16, seed=0, shuffle=False)
    streamed = trainer.eval_epoch_stream(state, pipe.epoch(0), seed=0)

    assert all(np.isfinite(streamed)), streamed
    # identical data/weights; only the per-batch sample keys differ, so the
    # two ELBO estimates agree to sampling noise
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(resident),
                               rtol=0.1, atol=1.0)


def test_pipeline_bf16_wire_on_mesh_multihost():
    """bf16 wire composed with a mesh sharding and the multihost assembly
    path: batches arrive bf16 and sharded, equal to the single-process
    device_put path, and a sharded train step consumes them."""
    import jax
    from targetvae_tpu.parallel import make_mesh
    from targetvae_tpu.parallel.mesh import batch_sharding
    from targetvae_tpu.parallel.pjit import shard_state

    images = np.random.RandomState(0).rand(40, 12, 12, 1).astype(np.float32)
    mesh = make_mesh(data=8, model=1)
    sh = batch_sharding(mesh)
    plain = HostDataPipeline(images, batch_size=16, seed=3, sharding=sh,
                             multihost=False, wire_dtype="bfloat16")
    multi = HostDataPipeline(images, batch_size=16, seed=3, sharding=sh,
                             multihost=True, wire_dtype="bfloat16")
    got_p, got_m = list(plain.epoch(0)), list(multi.epoch(0))
    assert len(got_p) == len(got_m) == 3
    for bp, bm in zip(got_p, got_m):
        assert bp.y.dtype == jnp.bfloat16 and bm.y.dtype == jnp.bfloat16
        assert bm.y.sharding.is_equivalent_to(sh, bm.y.ndim)
        np.testing.assert_array_equal(
            np.asarray(bp.y, np.float32), np.asarray(bm.y, np.float32))
        np.testing.assert_array_equal(np.asarray(bp.w), np.asarray(bm.w))

    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32),
        EncoderConfig(image_dim=12, z_dim=2, kernels_num=16, kernels_size=7,
                      padding=2, groupconv=4),
        LikelihoodConfig()))
    tr = Trainer(model, TrainConfig(learning_rate=1e-3, minibatch_size=16,
                                    dp=8))
    tr.attach_mesh(mesh)
    state = shard_state(mesh, tr.init_state(0))
    state, m = tr.train_epoch_stream(state, multi.epoch(0))
    assert all(np.isfinite(np.asarray(m))), m
    assert int(jax.device_get(state.step)) == 3


def test_pipeline_worker_error_surfaces(monkeypatch):
    """A worker-thread failure must raise in the consumer, not truncate the
    epoch silently (silent truncation = quiet data loss)."""
    import pytest
    import targetvae_tpu.data.native as native

    images = np.random.RandomState(0).rand(48, 8, 8, 1).astype(np.float32)
    pipe = HostDataPipeline(images, batch_size=16, seed=0)
    calls = {"n": 0}
    orig = native.gather_f32

    def flaky(arr, idx):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("disk went away")
        return orig(arr, idx)

    monkeypatch.setattr(native, "gather_f32", flaky)
    with pytest.raises(RuntimeError, match="worker failed"):
        list(pipe.epoch(0))
