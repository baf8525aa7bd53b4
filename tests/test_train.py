"""Training harness: Trainer scan-epochs, schedules, checkpoint round-trip."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetvae_tpu.models import TargetVAE
from targetvae_tpu.train import (
    EarlyStopping, ReduceLROnPlateau, Trainer, fit, RunLogger,
    load_checkpoint, save_checkpoint, run_dir_name,
    set_learning_rate, get_learning_rate)
from targetvae_tpu.utils.config import (
    EncoderConfig, GeneratorConfig, LikelihoodConfig, ModelConfig, TrainConfig)


def small_model():
    return TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32, num_layers=2),
        EncoderConfig(image_dim=12, z_dim=2, kernels_num=16, kernels_size=7,
                      padding=2, groupconv=4),
        LikelihoodConfig()))


def blob_data(n, d=12, seed=0):
    rng = np.random.RandomState(seed)
    ys = np.zeros((n, d, d, 1), np.float32)
    for i in range(n):
        cx, cy = rng.randint(3, d - 3, 2)
        ys[i, cy - 2:cy + 2, cx - 2:cx + 2, 0] = 1.0
    return jnp.asarray(ys)


def test_trainer_elbo_improves():
    model = small_model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, minibatch_size=16,
                                         seed=0))
    state = trainer.init_state(0)
    data = blob_data(48)
    first = None
    for _ in range(6):
        state, (elbo, gen_loss, kl) = trainer.train_epoch(state, data)
        if first is None:
            first = elbo
    assert elbo > first + 1.0, (first, elbo)
    assert int(state.step) == 6 * 3  # 48/16 = 3 batches per epoch


def test_trainer_partial_batch():
    model = small_model()
    trainer = Trainer(model, TrainConfig(minibatch_size=20))
    state = trainer.init_state(0)
    data = blob_data(50)  # 2 full batches + tail of 10
    state, metrics = trainer.train_epoch(state, data)
    assert int(state.step) == 3
    ev = trainer.eval_epoch(state, data)
    assert all(np.isfinite(v) for v in ev)


def test_plateau_scheduler_matches_torch_semantics():
    s = ReduceLROnPlateau(1.0, mode="max", factor=0.5, patience=2,
                          threshold=1e-4)
    lrs = []
    for m in [1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0]:
        lrs.append(s.step(m))
    # first 1.0 sets best; three non-improving -> cut at the 4th value
    assert lrs[:4] == [1.0, 1.0, 1.0, 0.5]
    # 2.0 improves (resets); then two bad epochs tolerated, cut on third
    assert lrs[4:] == [0.5, 0.5, 0.5, 0.25]


def test_early_stopping_counter():
    saves = []
    es = EarlyStopping(patience=2, delta=1e-4, save_fn=lambda: saves.append(1))
    es(10.0)
    assert saves == [1]
    es(10.0)   # not improved by > delta
    es(10.00005)
    assert es.early_stop
    assert len(saves) == 1


def test_checkpoint_roundtrip(tmp_path):
    model = small_model()
    params = model.init(jax.random.key(0))
    path = os.path.join(tmp_path, "ck.sav")
    save_checkpoint(path, params, model.cfg, step=7)
    p2, cfg2, payload = load_checkpoint(path)
    assert payload["step"] == 7
    assert cfg2 == model.cfg
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpointer_matches_sync(tmp_path):
    """AsyncCheckpointer writes byte-compatible training_state files: a
    resume-load restores the identical state, and the snapshot is taken
    before save() returns (mutating/deleting the state after is safe)."""
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.train.checkpoint import (
        AsyncCheckpointer, load_train_state, save_train_state)
    from targetvae_tpu.utils.config import TrainConfig

    model = small_model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    state = trainer.init_state(0)
    y = jax.random.uniform(jax.random.key(1), (4, 12, 12, 1))
    state, _ = trainer._train_step(state, y)

    sync_p = os.path.join(tmp_path, "sync.sav")
    async_p = os.path.join(tmp_path, "async.sav")
    save_train_state(sync_p, state, model.cfg, host_state={"epoch": 3})
    ck = AsyncCheckpointer()
    ck.save(async_p, state, model.cfg, host_state={"epoch": 3})
    del state        # donated-buffer semantics: snapshot must already exist
    ck.wait()

    template = trainer.init_state(0)
    s1, _, h1 = load_train_state(sync_p, template)
    s2, _, h2 = load_train_state(async_p, template)
    assert h1 == h2 == {"epoch": 3}
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s1.opt_state),
                    jax.tree.leaves(s2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(s1.step) == int(s2.step) == 1


def test_async_checkpointer_surfaces_write_errors(tmp_path):
    """A failed background write (bad directory here; disk-full/perms in the
    field) must re-raise from wait()/the next save(), not vanish silently."""
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.train.checkpoint import AsyncCheckpointer
    from targetvae_tpu.utils.config import TrainConfig

    model = small_model()
    trainer = Trainer(model, TrainConfig())
    state = trainer.init_state(0)

    ck = AsyncCheckpointer()
    bad = os.path.join(tmp_path, "no_such_dir", "state.sav")
    ck.save(bad, state, model.cfg)
    with pytest.raises(OSError):
        ck.wait()
    # the error is consumed: a subsequent good save works
    good = os.path.join(tmp_path, "state.sav")
    ck.save(good, state, model.cfg)
    ck.wait()
    assert os.path.exists(good)


def test_select_device_reports_selected(capsys):
    """-d 1 must select (and report) device 1, not device 0 (8 virtual CPU
    devices from conftest)."""
    from targetvae_tpu.cli.common import select_device

    assert len(jax.devices()) >= 2
    select_device(1)
    err = capsys.readouterr().err
    assert str(jax.devices()[1]) in err
    assert jax.config.jax_default_device == jax.devices()[1]
    # restore for other tests in this process
    jax.config.update("jax_default_device", None)


def test_train_epoch_progress_chunks_match_plain_epoch():
    """The chunked-scan progress path reports streaming means mid-epoch and
    leaves the epoch result identical to the unchunked scan."""
    model = small_model()

    y = jax.random.uniform(jax.random.key(1), (40, 12, 12, 1))
    t1 = Trainer(model, TrainConfig(learning_rate=1e-3, minibatch_size=8))
    s_plain, m_plain = t1.train_epoch(t1.init_state(0), y)

    t2 = Trainer(model, TrainConfig(learning_rate=1e-3, minibatch_size=8))
    t2.progress_chunk = 2              # 5 full batches -> chunks of 2, 2, 1
    calls = []
    s_prog, m_prog = t2.train_epoch(t2.init_state(0), y,
                                    progress=lambda *a: calls.append(a))
    # reports arrive mid-epoch (all chunks except the last, pipelined)
    assert len(calls) == 2
    assert calls[0][0] == 16 and calls[1][0] == 32  # images seen
    assert all(np.isfinite(c[1]) for c in calls)
    np.testing.assert_allclose(m_plain, m_prog, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_prog.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_set_learning_rate():
    model = small_model()
    trainer = Trainer(model, TrainConfig(learning_rate=2e-4))
    state = trainer.init_state(0)
    assert abs(get_learning_rate(state) - 2e-4) < 1e-9
    state = set_learning_rate(state, 1e-4)
    assert abs(get_learning_rate(state) - 1e-4) < 1e-9
    # state still usable for stepping
    state, m = trainer.train_epoch(state, blob_data(20))
    assert np.isfinite(m[0])


def test_fit_smoke(tmp_path):
    model = small_model()
    tc = TrainConfig(learning_rate=1e-3, minibatch_size=16, num_epochs=3,
                     save_interval=2)
    name = run_dir_name("blobs", 2, "attention", "attention+offsets", 4,
                        timestamp="test")
    logger = RunLogger(str(tmp_path), name, args_repr="test args")
    state = fit(model, tc, logger, blob_data(32), blob_data(16, seed=1))
    logger.close()
    run = os.path.join(tmp_path, name)
    log = open(os.path.join(run, "train_log.txt")).read()
    assert "Epoch\tSplit\tELBO\tError\tKL" in log
    assert "\ttrain\t" in log and "\ttest\t" in log
    # best-model checkpoints written by EarlyStopping save_fn
    assert os.path.exists(os.path.join(run, "inference.sav"))
    assert os.path.exists(os.path.join(run, "generator.sav"))
    # periodic snapshot at epoch 2
    assert os.path.exists(os.path.join(run, "inference_epoch2.sav"))


def test_bfloat16_compute_on_cpu_falls_back():
    """bf16 compute dtype must work off-TPU (Pallas dispatch requires the TPU
    backend; the XLA path handles bf16 everywhere)."""
    model = small_model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3,
                                         minibatch_size=16,
                                         compute_dtype="bfloat16"))
    state = trainer.init_state(0)
    state, (elbo, gen_loss, kl) = trainer.train_epoch(state, blob_data(32))
    assert np.isfinite(elbo) and np.isfinite(kl)
