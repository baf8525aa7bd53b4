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


def test_sp_train_step_matches_single_device():
    """--sp (grid-sharded posterior, parallel/grid_softmax.py) training step
    matches the unsharded step numerically on the P16 / 65x65 attention grid
    — the 67k-cell joint posterior SURVEY section 5 names. Gumbel noise is
    drawn once for the full grid, so both runs sample identically."""
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32, num_layers=1,
                        fourier_expansion=False),
        EncoderConfig(image_dim=64, z_dim=2, kernels_num=8, kernels_size=64,
                      padding=32, groupconv=16),
        LikelihoodConfig()))
    from targetvae_tpu.models.encoders import attn_dim_for
    assert attn_dim_for(model.cfg.encoder) == 65  # 65*65*16 = 67600 cells

    y = jax.random.uniform(jax.random.key(1), (4, 64, 64, 1))

    plain = Trainer(model, TrainConfig(learning_rate=1e-3))
    s0 = plain.init_state(0)
    _, m_single = plain._train_step(s0, y)

    cfg_sp = TrainConfig(learning_rate=1e-3, dp=2, tp=4, sp=True)
    sp_tr = Trainer(model, cfg_sp)
    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    sp_tr.attach_mesh(mesh)
    assert sp_tr._sp_ctx(4) == (mesh, "model")
    s1 = shard_state(mesh, sp_tr.init_state(0))
    ys, _ = shard_batch(mesh, y)
    _, m_sp = jax.jit(sp_tr._step_impl)(s1, ys)

    np.testing.assert_allclose(np.asarray(m_single), np.asarray(m_sp),
                               rtol=2e-4, atol=1e-3)


def test_sp_mode_b_padded_cells():
    """Mode B's odd 17x17 grid (289 cells) does not divide the 4-way model
    axis; the -1e30 cell padding must keep the SP step finite and equal to
    the unsharded step."""
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32, num_layers=1,
                        fourier_expansion=False),
        EncoderConfig(t_inf="attention", r_inf="unimodal", image_dim=16,
                      z_dim=2, kernels_num=8, groupconv=0),
        LikelihoodConfig()))

    y = jax.random.uniform(jax.random.key(1), (4, 16, 16, 1))
    plain = Trainer(model, TrainConfig(learning_rate=1e-3))
    _, m_single = plain._train_step(plain.init_state(0), y)

    sp_tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=2, tp=4,
                                       sp=True))
    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    sp_tr.attach_mesh(mesh)
    s1 = shard_state(mesh, sp_tr.init_state(0))
    ys, _ = shard_batch(mesh, y)
    _, m_sp = jax.jit(sp_tr._step_impl)(s1, ys)

    assert np.isfinite(np.asarray(m_sp)).all()
    np.testing.assert_allclose(np.asarray(m_single), np.asarray(m_sp),
                               rtol=2e-4, atol=1e-3)


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


def test_dp_tp_mesh_takes_pallas_kernel_path(monkeypatch):
    """VERDICT r1 #3 done-criterion: on a ('data','model') mesh the Trainer's
    two-axis shard_map loss (train/loop.py::_loss_fn_dp) must still dispatch
    every fused Pallas kernel — the inverted counter — and the sharded step
    must match both the single-device kernel step and the plain XLA step.

    The kernel gates key on jax.default_backend() == 'tpu'; here the backend
    is patched and the kernels run in interpret mode, with all sampling noise
    zeroed (posterior deterministic=True == softmax sample, the same collapse
    the gumbel patch applies to the XLA tier)."""
    import targetvae_tpu.kernels.decoder_pose as DP
    import targetvae_tpu.kernels.lifted_encoder as LE
    import targetvae_tpu.kernels.posterior as PK
    import targetvae_tpu.models.encoders as EN

    # zero all sampling noise so shard-index key folds cannot matter
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        EN, "gumbel_softmax",
        lambda key, logits, tau=1.0, axis=-1: jax.nn.softmax(logits, axis=axis))

    model = _model()

    def run(trainer, mesh=None):
        y = jax.random.uniform(jax.random.key(1), (16, 16, 16, 1))
        state = trainer.init_state(0)
        if mesh is not None:
            trainer.attach_mesh(mesh)
            state = shard_state(mesh, state)
            y, _ = shard_batch(mesh, y)
        _, m = jax.jit(trainer._step_impl)(state, y)
        return np.asarray(jax.device_get(m))

    # 1) plain XLA tier (kernels off: real backend is cpu)
    m_xla = run(Trainer(model, TrainConfig(learning_rate=1e-3,
                                           compute_dtype="bfloat16")))

    # 2)+3) gate the kernel paths on, in interpret mode, with call counters
    calls = {"lift": 0, "posterior": 0, "decoder": 0}
    orig = (LE.fused_lifted_encoder, PK.fused_posterior, DP.fused_pose_decoder)

    def lift(*a, **kw):
        calls["lift"] += 1
        kw["interpret"] = True
        return orig[0](*a, **kw)

    def post(*a, **kw):
        calls["posterior"] += 1
        kw["interpret"] = True
        kw["deterministic"] = True
        return orig[1](*a, **kw)

    def dec(*a, **kw):
        calls["decoder"] += 1
        kw["interpret"] = True
        return orig[2](*a, **kw)

    monkeypatch.setattr(LE, "fused_lifted_encoder", lift)
    monkeypatch.setattr(PK, "fused_posterior", post)
    monkeypatch.setattr(DP, "fused_pose_decoder", dec)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    m_kernel = run(Trainer(model, TrainConfig(learning_rate=1e-3,
                                              compute_dtype="bfloat16")))
    single = dict(calls)
    assert all(v > 0 for v in single.values()), single

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, dp=4, tp=2,
                                         compute_dtype="bfloat16"))
    m_mesh = run(trainer, mesh=mesh)
    assert trainer._use_mesh_shardmap()
    mesh_calls = {k: calls[k] - single[k] for k in calls}
    assert all(v > 0 for v in mesh_calls.values()), mesh_calls  # the point

    assert np.isfinite(m_mesh).all()
    # kernel path, sharded vs single-device: same math, shard_map composition
    np.testing.assert_allclose(m_kernel, m_mesh, rtol=2e-3, atol=0.05)
    # kernel path vs XLA tier: bf16-kernel-level tolerance
    np.testing.assert_allclose(m_xla, m_mesh, rtol=2e-2, atol=0.3)


def test_sp_particles_ctf_step_matches_single_device():
    """--sp composed with the cryo-EM likelihood (gaussian + per-particle
    CTF + circular mask) — the configuration the grid-sharded posterior
    exists for. The sharded step must match the unsharded step."""
    import pandas as pd

    from targetvae_tpu.data.ctf import CTF_COLUMNS, ctf_filter

    d = 16
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32, num_layers=1,
                        fourier_expansion=False),
        EncoderConfig(image_dim=d, z_dim=2, kernels_num=8, kernels_size=9,
                      padding=4, groupconv=8),
        LikelihoodConfig(kind="gaussian", use_ctf=True, mask_radius=5)))

    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randn(4, d, d, 1).astype(np.float32))
    cp = pd.DataFrame([[1.5, 2.7, 300, 1.2, 100, 10, 0.2, 30]] * 4,
                      columns=CTF_COLUMNS)
    ctf = jnp.asarray(ctf_filter(cp, d - 1, d - 1))

    plain = Trainer(model, TrainConfig(learning_rate=1e-3))
    _, m_single = plain._train_step(plain.init_state(0), y, ctf=ctf)

    sp_tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=2, tp=4,
                                       sp=True))
    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    sp_tr.attach_mesh(mesh)
    s1 = shard_state(mesh, sp_tr.init_state(0))
    ys, ctfs = shard_batch(mesh, y, ctf)
    _, m_sp = jax.jit(sp_tr._step_impl)(s1, ys, ctfs)

    assert np.isfinite(np.asarray(m_sp)).all()
    np.testing.assert_allclose(np.asarray(m_single), np.asarray(m_sp),
                               rtol=2e-4, atol=1e-3)
