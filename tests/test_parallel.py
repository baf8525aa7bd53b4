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
    # trailing Nones are normalized away (P('model', None) == P('model') as
    # a placement, but the jit cache key distinguishes them — mesh.py)
    spec = state.params["generator"]["hidden"][0]["w"].sharding.spec
    assert spec == jax.sharding.PartitionSpec("model")
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


@pytest.mark.parametrize("tier", ["conv1d", "patch"])
def test_dp_tp_mesh_takes_pallas_kernel_path(monkeypatch, tier):
    """VERDICT r1 #3 done-criterion: on a ('data','model') mesh the Trainer's
    two-axis shard_map loss (train/loop.py::_loss_fn_dp) must still dispatch
    every fused Pallas kernel — the inverted counter — and the sharded step
    must match both the single-device kernel step and the plain XLA step.

    Parametrized over both mode-C encoder tiers: 'conv1d' (the default
    1-D-conv lift + fused mix/heads kernel) and 'patch' (the opt-in
    single-kernel im2col encoder, TARGETVAE_ENCODER_TIER=patch).

    The kernel gates key on jax.default_backend() == 'tpu'; here the backend
    is patched and the kernels run in interpret mode, with all sampling noise
    zeroed (posterior deterministic=True == softmax sample, the same collapse
    the gumbel patch applies to the XLA tier)."""
    import targetvae_tpu.kernels.decoder_pose as DP
    import targetvae_tpu.kernels.lifted_encoder as LE
    import targetvae_tpu.kernels.mix_heads as MH
    import targetvae_tpu.kernels.posterior as PK
    import targetvae_tpu.models.encoders as EN

    if tier == "patch":
        monkeypatch.setenv("TARGETVAE_ENCODER_TIER", "patch")

    model = _model()
    # init params BEFORE patching the noise: the test model uses
    # fourier_expansion, whose W init is jax.random.normal (ops/fourier.py) —
    # patching first would degenerate the generator (ADVICE r2)
    state0 = Trainer(model, TrainConfig(learning_rate=1e-3)).init_state(0)

    # zero all sampling noise so shard-index key folds cannot matter
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        EN, "gumbel_softmax",
        lambda key, logits, tau=1.0, axis=-1: jax.nn.softmax(logits / tau,
                                                             axis=axis))

    def run(trainer, mesh=None):
        y = jax.random.uniform(jax.random.key(1), (16, 16, 16, 1))
        state = state0
        if mesh is not None:
            trainer.attach_mesh(mesh)
            state = shard_state(mesh, state)
            y, _ = shard_batch(mesh, y)
        _, m = jax.jit(trainer._step_impl)(state, y)
        return np.asarray(jax.device_get(m))

    # 1) plain XLA tier (kernels off: real backend is cpu)
    m_xla = run(Trainer(model, TrainConfig(learning_rate=1e-3,
                                           compute_dtype="bfloat16")))

    # 2)+3) gate the kernel paths on, in interpret mode, with call counters.
    # "lift" counts whichever encoder kernel the tier dispatches: the patch
    # im2col kernel or the conv1d tier's fused mix/heads kernel.
    calls = {"lift": 0, "posterior": 0, "decoder": 0}
    orig = (LE.fused_lifted_encoder, PK.fused_posterior, DP.fused_pose_decoder,
            MH.fused_lift_act_mix_heads)

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

    def mix(*a, **kw):
        calls["lift"] += 1
        kw["interpret"] = True
        return orig[3](*a, **kw)

    monkeypatch.setattr(LE, "fused_lifted_encoder", lift)
    monkeypatch.setattr(PK, "fused_posterior", post)
    monkeypatch.setattr(DP, "fused_pose_decoder", dec)
    monkeypatch.setattr(MH, "fused_lift_act_mix_heads", mix)
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


def test_sp_mesh_takes_pallas_kernel_path(monkeypatch):
    """VERDICT r2 #3 done-criterion: --sp on a ('data','model') mesh must
    keep every fused kernel live — the encoder lift, the pose decoder, and
    the per-shard SP posterior kernel (train/loop.py::_loss_fn_sp) — and the
    sharded step must match the unsharded kernel step numerically."""
    import targetvae_tpu.kernels.decoder_pose as DP
    import targetvae_tpu.kernels.lifted_encoder as LE
    import targetvae_tpu.kernels.mix_heads as MH
    import targetvae_tpu.kernels.posterior as PK
    import targetvae_tpu.models.encoders as EN

    model = _model()
    state0 = Trainer(model, TrainConfig(learning_rate=1e-3)).init_state(0)

    # zero all sampling noise (params already initialized above)
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        EN, "gumbel_softmax",
        lambda key, logits, tau=1.0, axis=-1: jax.nn.softmax(logits / tau,
                                                             axis=axis))

    # "lift" counts whichever encoder kernel the tier dispatches (the
    # default conv1d tier fires the fused mix/heads kernel)
    calls = {"lift": 0, "posterior": 0, "decoder": 0, "sp_post": 0}
    orig = (LE.fused_lifted_encoder, PK.fused_posterior,
            DP.fused_pose_decoder, PK.posterior_shard_partials,
            MH.fused_lift_act_mix_heads)

    def lift(*a, **kw):
        calls["lift"] += 1
        kw["interpret"] = True
        return orig[0](*a, **kw)

    def mix(*a, **kw):
        calls["lift"] += 1
        kw["interpret"] = True
        return orig[4](*a, **kw)

    def post(*a, **kw):
        calls["posterior"] += 1
        kw["interpret"] = True
        kw["deterministic"] = True
        return orig[1](*a, **kw)

    def dec(*a, **kw):
        calls["decoder"] += 1
        kw["interpret"] = True
        return orig[2](*a, **kw)

    def sp_post(*a, **kw):
        calls["sp_post"] += 1
        kw["interpret"] = True
        return orig[3](*a, **kw)

    monkeypatch.setattr(LE, "fused_lifted_encoder", lift)
    monkeypatch.setattr(PK, "fused_posterior", post)
    monkeypatch.setattr(DP, "fused_pose_decoder", dec)
    monkeypatch.setattr(PK, "posterior_shard_partials", sp_post)
    monkeypatch.setattr(MH, "fused_lift_act_mix_heads", mix)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    y = jax.random.uniform(jax.random.key(1), (16, 16, 16, 1))

    single = Trainer(model, TrainConfig(learning_rate=1e-3,
                                        compute_dtype="bfloat16"))
    _, m_single = jax.jit(single._step_impl)(state0, y)
    m_single = np.asarray(jax.device_get(m_single))
    base = dict(calls)
    assert base["lift"] > 0 and base["posterior"] > 0 and base["decoder"] > 0

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    sp_tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=4, tp=2,
                                       sp=True, compute_dtype="bfloat16"))
    sp_tr.attach_mesh(mesh)
    assert sp_tr._use_sp_shardmap()
    s1 = shard_state(mesh, state0)
    ys, _ = shard_batch(mesh, y)
    _, m_sp = jax.jit(sp_tr._step_impl)(s1, ys)
    m_sp = np.asarray(jax.device_get(m_sp))

    d = {k: calls[k] - base[k] for k in calls}
    assert d["lift"] > 0 and d["decoder"] > 0 and d["sp_post"] > 0, d
    assert d["posterior"] == 0, d   # SP uses the per-shard kernel instead

    assert np.isfinite(m_sp).all()
    np.testing.assert_allclose(m_single, m_sp, rtol=2e-3, atol=0.05)


@pytest.mark.parametrize("nshard", [3, 5, 7])
@pytest.mark.parametrize("mode", ["B", "C"])
def test_sp_padding_property(nshard, mode):
    """VERDICT r2 #6: the -1e30 SP cell padding (losses/elbo.py) must be
    exact for shard counts that never divide the grid — 3/5/7-way model
    axes, mode B's 17x17 grid (289 cells) and a padding mode-C grid (484
    cells)."""
    if mode == "B":
        ecfg = EncoderConfig(t_inf="attention", r_inf="unimodal",
                             image_dim=16, z_dim=2, kernels_num=8,
                             groupconv=0)
        cells = 17 * 17
        d = 16
    else:
        ecfg = EncoderConfig(image_dim=10, z_dim=2, kernels_num=8,
                             kernels_size=4, padding=2, groupconv=4)
        cells = 11 * 11 * 4
        d = 10
    assert cells % nshard != 0
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32, num_layers=1,
                        fourier_expansion=False),
        ecfg, LikelihoodConfig()))

    y = jax.random.uniform(jax.random.key(1), (3, d, d, 1))
    plain = Trainer(model, TrainConfig(learning_rate=1e-3))
    _, m_single = plain._train_step(plain.init_state(0), y)

    sp_tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=1, tp=nshard,
                                       sp=True))
    mesh = make_mesh(jax.devices()[:nshard], data=1, model=nshard)
    sp_tr.attach_mesh(mesh)
    s1 = shard_state(mesh, sp_tr.init_state(0))
    ys, _ = shard_batch(mesh, y)
    _, m_sp = jax.jit(sp_tr._step_impl)(s1, ys)

    assert np.isfinite(np.asarray(m_sp)).all()
    np.testing.assert_allclose(np.asarray(m_single), np.asarray(m_sp),
                               rtol=2e-4, atol=1e-3)


def test_sp_gradient_equality_padded_mode_c():
    """VERDICT r2 #6: parameter GRADIENTS (not just step metrics) of the SP
    path must equal the unsharded path on a mode-C grid that pads (484 cells
    over a 3-way model axis)."""
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=32, num_layers=1,
                        fourier_expansion=False),
        EncoderConfig(image_dim=10, z_dim=2, kernels_num=8, kernels_size=4,
                      padding=2, groupconv=4),
        LikelihoodConfig()))
    y = jax.random.uniform(jax.random.key(1), (4, 10, 10, 1))
    key = jax.random.key(3)

    plain = Trainer(model, TrainConfig(learning_rate=1e-3))
    params = plain.init_state(0).params
    g0 = jax.grad(lambda p: plain._loss_fn(p, y, key, None)[0])(params)

    sp_tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=2, tp=3,
                                       sp=True))
    mesh = make_mesh(jax.devices()[:6], data=2, model=3)
    sp_tr.attach_mesh(mesh)
    assert sp_tr._sp_ctx(4) == (mesh, "model")
    g1 = jax.grad(lambda p: sp_tr._loss_fn(p, y, key, None)[0])(params)

    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, a in flat0:
        b = flat1[path]
        assert np.isfinite(np.asarray(b)).all(), path
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6, err_msg=str(path))


# ---------------------------------------------------------------------------
# compiled-HLO structural assertions (VERDICT r2 #5): with no multi-chip
# hardware attached, the compiled module is the available instrument for
# multi-chip PERFORMANCE sanity — assert the collectives the design promises
# ---------------------------------------------------------------------------

def _collective_shapes(hlo: str, op: str):
    """[(dtype, shape, element_count)] for every result (tuple results are
    flattened) of every `op` instruction in the compiled module text."""
    import re
    out = []
    for m in re.finditer(r"= (\(.*?\)|\S+) " + op + r"\(", hlo):
        for t in re.finditer(r"(\w+)\[([\d,]*)\]", m.group(1)):
            dims = [int(x) for x in t.group(2).split(",") if x]
            n = 1
            for d in dims:
                n *= d
            out.append((t.group(1), dims, n))
    return out


@pytest.mark.parametrize("dp,tp", [(4, 2), (8, 1)])
def test_multichip_hlo_collective_structure(dp, tp):
    """The compiled sharded train step must (a) never all-gather the full
    batch or the lifted activation tensor, (b) psum gradients (all-reduce
    present), (c) keep total all-gather traffic bounded by the TP param
    boundary the design claims (train/loop.py:38-45)."""
    model = _model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, dp=dp, tp=tp))
    mesh = make_mesh(jax.devices()[:8], data=dp, model=tp)
    trainer.attach_mesh(mesh)
    state = shard_state(mesh, trainer.init_state(0))
    y = jax.random.uniform(jax.random.key(1), (16, 16, 16, 1))
    ys, _ = shard_batch(mesh, y)
    hlo = jax.jit(trainer._step_impl).lower(state, ys).compile().as_text()

    # the lifted activation at FULL batch: B*H'*W'*R*K = 16*16*16*4*32
    full_lift = 16 * 16 * 16 * 4 * 32

    # (a) nothing batch-replicated: no all-gather may materialize the
    # full-batch lift tensor (or anything at that scale) on one device.
    # What IS allowed — and measured — are per-DATA-shard Megatron-style
    # boundaries in the backward (B/dp-scale activations gathered over
    # 'model' for TP weight grads, ~131k elements here, plus the
    # param-scale rotated filter bank).
    gathers = _collective_shapes(hlo, "all-gather")
    for dtype, dims, n in gathers:
        assert n <= full_lift // dp, (dtype, dims, n)

    # (b) gradient psums exist (XLA lowers them as all-reduce; at dp>1 the
    # grads MUST cross 'data')
    reduces = _collective_shapes(hlo, "all-reduce")
    assert len(reduces) > 0, "no all-reduce in the sharded step"

    # (c) total all-gather traffic stays at the per-shard-activation scale:
    # a few TP boundaries, never a batch-scale re-replication
    total_gathered = sum(n for _, _, n in gathers)
    assert total_gathered <= 5 * (full_lift // dp), (total_gathered,
                                                     full_lift // dp)


def test_multichip_hlo_sp_collective_structure():
    """Same structural assertions for the --sp (grid-sharded posterior)
    step on a 2x4 mesh, plus: the joint-cell reductions must ride psums
    (all-reduce), not a gather of the full cell axis."""
    model = _model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, dp=2, tp=4,
                                         sp=True))
    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    trainer.attach_mesh(mesh)
    state = shard_state(mesh, trainer.init_state(0))
    y = jax.random.uniform(jax.random.key(1), (16, 16, 16, 1))
    ys, _ = shard_batch(mesh, y)
    hlo = jax.jit(trainer._step_impl).lower(state, ys).compile().as_text()

    full_lift = 16 * 16 * 16 * 4 * 32
    for dtype, dims, n in _collective_shapes(hlo, "all-gather"):
        # per-data-shard TP boundaries only — never the full-batch lift or
        # a re-replicated joint posterior grid
        assert n <= full_lift // 2, (dtype, dims, n)
    assert len(_collective_shapes(hlo, "all-reduce")) > 0


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}


def _collective_bytes(hlo: str, op: str) -> int:
    """Per-device result bytes summed over every `op` in the module."""
    return sum(n * _DTYPE_BYTES.get(dtype, 4)
               for dtype, _, n in _collective_shapes(hlo, op))


def _force_interpret_kernels(monkeypatch):
    """Gate the Pallas kernel paths on (backend 'tpu') with every kernel in
    interpret mode, so kernel-tier steps can be lowered AND compiled on the
    CPU backend for HLO inspection."""
    import targetvae_tpu.kernels.decoder_pose as DP
    import targetvae_tpu.kernels.lifted_encoder as LE
    import targetvae_tpu.kernels.mix_heads as MH
    import targetvae_tpu.kernels.posterior as PK
    import targetvae_tpu.parallel.grid_softmax as GS

    orig = (LE.fused_lifted_encoder, PK.fused_posterior,
            DP.fused_pose_decoder, MH.fused_lift_act_mix_heads,
            GS.sp_posterior_kernel)
    monkeypatch.setattr(LE, "fused_lifted_encoder",
                        lambda *a, **kw: orig[0](*a, **{**kw,
                                                        "interpret": True}))
    monkeypatch.setattr(PK, "fused_posterior",
                        lambda *a, **kw: orig[1](*a, **{**kw,
                                                        "interpret": True}))
    monkeypatch.setattr(DP, "fused_pose_decoder",
                        lambda *a, **kw: orig[2](*a, **{**kw,
                                                        "interpret": True}))
    monkeypatch.setattr(MH, "fused_lift_act_mix_heads",
                        lambda *a, **kw: orig[3](*a, **{**kw,
                                                        "interpret": True}))
    # interpret is the 4th positional arg (axis, sig_r, zd, interpret, ...)
    monkeypatch.setattr(
        GS, "sp_posterior_kernel",
        lambda axis, sig_r, zd, interpret, *a: orig[4](axis, sig_r, zd,
                                                       True, *a))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def _sp_step_hlo(model, batch, dp, tp):
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, dp=dp, tp=tp,
                                         sp=True, compute_dtype="bfloat16"))
    mesh = make_mesh(jax.devices()[:dp * tp], data=dp, model=tp)
    trainer.attach_mesh(mesh)
    assert trainer._use_sp_shardmap(), "kernel-SP path not engaged"
    state = shard_state(mesh, trainer.init_state(0))
    d = model.cfg.encoder.image_dim
    y = jax.random.uniform(jax.random.key(1), (batch, d, d, 1))
    ys, _ = shard_batch(mesh, y)
    return jax.jit(trainer._step_impl).lower(state, ys).compile().as_text()


def test_sp_collective_bytes_scale_inverse_with_model_axis(monkeypatch):
    """SP's communication bill (VERDICT r3 #7): the Ulysses batch<->cell
    all_to_all moves each device's (B/(dp*T), cells) posterior inputs ONCE —
    per-device bytes O(B*cells/(dp*T)) that HALVE when the 'model' axis
    doubles — and the cell reductions psum O(B)-sized partials. Nothing may
    communicate at the replicated O(B*cells) scale a cell-axis all-gather
    would cost. The per-device all_to_all volume formula this pins down:

        bytes/device ~= (3 + 2*z_dim) * 4 * B * cells_padded / (dp * T)

    (attn, th_mu, th_logstd are (B_l, cells); z_mu, z_logstd add z_dim
    lanes each; f32. cells_padded = cells rounded up to T*1024.)

    Measured on the PRODUCTION path: the kernel-SP tier (_loss_fn_sp),
    compiled with interpret-mode kernels so the CPU backend can build the
    same SPMD module the TPU runs."""
    _force_interpret_kernels(monkeypatch)
    model = _model()
    zd = model.cfg.encoder.z_dim
    B = 16

    hlo_t2 = _sp_step_hlo(model, B, dp=2, tp=2)
    hlo_t4 = _sp_step_hlo(model, B, dp=2, tp=4)

    a2a_t2 = _collective_bytes(hlo_t2, "all-to-all")
    a2a_t4 = _collective_bytes(hlo_t4, "all-to-all")
    assert a2a_t2 > 0 and a2a_t4 > 0, "SP step lost its Ulysses exchange"

    # (a) the volume matches the formula EXACTLY at both T — this IS the
    # O(B*cells_p/(dp*T)) law: with real grids (cells >> T*1024) bytes halve
    # when T doubles; at this toy scale cells_p == T*1024 (pure padding) so
    # the two volumes are equal. The 2x is the backward pass: the VJP of an
    # all_to_all is the inverse all_to_all, so each array crosses twice.
    from targetvae_tpu.models.encoders import attn_dim_for
    hp = attn_dim_for(model.cfg.encoder)
    cells = hp * hp * model.cfg.encoder.groupconv
    for tp, a2a in ((2, a2a_t2), (4, a2a_t4)):
        cells_p = -(-cells // (tp * 1024)) * (tp * 1024)
        expect = 2 * (3 + 2 * zd) * 4 * B * cells_p // (2 * tp)
        assert a2a == expect, (tp, a2a, expect, cells, cells_p)

    # (b) growing T never grows the exchange (no O(B*cells) re-replication)
    assert a2a_t4 <= a2a_t2, (a2a_t2, a2a_t4)

    # (c) reductions are O(params + B), never O(B*cells): each all-reduce
    # operand is a gradient psum (bounded by the largest parameter) or a
    # batch-scale LSE/moment partial — a cell-axis design error would show
    # up here as a (B, cells)-sized all-reduce
    params = Trainer(model, TrainConfig()).init_state(0).params
    max_leaf = max(x.size for x in jax.tree.leaves(params))
    for tp, hlo in ((2, hlo_t2), (4, hlo_t4)):
        reduces = _collective_shapes(hlo, "all-reduce")
        assert reduces, "SP step lost its psums"
        biggest = max(n for _, _, n in reduces)
        assert biggest <= max(max_leaf, 64 * B), (biggest, max_leaf)


def test_sp_mesh_kernel_path_mode_b_with_ctf(monkeypatch):
    """The kernel-SP path (_loss_fn_sp) composed with mode B's fast tier AND
    the gaussian+CTF+mask likelihood — every fused kernel stays live and the
    step matches the unsharded kernel step."""
    import pandas as pd

    import targetvae_tpu.kernels.decoder_pose as DP
    import targetvae_tpu.kernels.mix_heads as MH
    import targetvae_tpu.kernels.posterior as PK
    from targetvae_tpu.data.ctf import CTF_COLUMNS, ctf_filter

    d = 16
    model = TargetVAE(ModelConfig(
        GeneratorConfig(z_dim=2, hidden_dim=64, num_layers=2,
                        fourier_expansion=True, fourier_sigma=2.0 / (d - 1)),
        EncoderConfig(t_inf="attention", r_inf="unimodal", image_dim=d,
                      z_dim=2, kernels_num=32, groupconv=0),
        LikelihoodConfig(kind="gaussian", use_ctf=True, mask_radius=6)))
    state0 = Trainer(model, TrainConfig(learning_rate=1e-3)).init_state(0)

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))

    calls = {"mix_heads": 0, "decoder": 0, "sp_post": 0, "posterior": 0}
    orig = (MH.fused_lift_act_mix_heads, DP.fused_pose_decoder,
            PK.posterior_shard_partials, PK.fused_posterior)

    def mh(*a, **kw):
        calls["mix_heads"] += 1
        kw["interpret"] = True
        return orig[0](*a, **kw)

    def dec(*a, **kw):
        calls["decoder"] += 1
        kw["interpret"] = True
        return orig[1](*a, **kw)

    def sp_post(*a, **kw):
        calls["sp_post"] += 1
        kw["interpret"] = True
        return orig[2](*a, **kw)

    def post(*a, **kw):
        calls["posterior"] += 1
        kw["interpret"] = True
        kw["deterministic"] = True
        return orig[3](*a, **kw)

    monkeypatch.setattr(MH, "fused_lift_act_mix_heads", mh)
    monkeypatch.setattr(DP, "fused_pose_decoder", dec)
    monkeypatch.setattr(PK, "posterior_shard_partials", sp_post)
    monkeypatch.setattr(PK, "fused_posterior", post)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randn(8, d, d, 1).astype(np.float32))
    cp = pd.DataFrame([[1.5, 2.7, 300, 1.2, 100, 10, 0.2, 30]] * 8,
                      columns=CTF_COLUMNS)
    ctf = jnp.asarray(ctf_filter(cp, d - 1, d - 1))

    single = Trainer(model, TrainConfig(learning_rate=1e-3,
                                        compute_dtype="bfloat16"))
    _, m_single = jax.jit(single._step_impl)(state0, y, ctf)
    m_single = np.asarray(jax.device_get(m_single))
    base = dict(calls)
    assert base["mix_heads"] > 0 and base["posterior"] > 0, base

    mesh = make_mesh(jax.devices()[:8], data=2, model=4)
    sp_tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=2, tp=4,
                                       sp=True, compute_dtype="bfloat16"))
    sp_tr.attach_mesh(mesh)
    assert sp_tr._use_sp_shardmap()
    s1 = shard_state(mesh, state0)
    ys, ctfs = shard_batch(mesh, y, ctf)
    _, m_sp = jax.jit(sp_tr._step_impl)(s1, ys, ctfs)
    m_sp = np.asarray(jax.device_get(m_sp))

    diff = {k: calls[k] - base[k] for k in calls}
    assert diff["mix_heads"] > 0 and diff["decoder"] > 0, diff
    assert diff["sp_post"] > 0, diff
    assert diff["posterior"] == 0, diff

    assert np.isfinite(m_sp).all()
    np.testing.assert_allclose(m_single, m_sp, rtol=2e-3, atol=0.05)


# ---------------------------------------------------------------------------
# ragged-tail zero-weight padding (VERDICT r3 #3): unaligned tail batches
# must keep the kernel shard_map path on meshes instead of the
# activation-all-gathering GSPMD fallback
# ---------------------------------------------------------------------------

def _zero_noise(monkeypatch):
    import targetvae_tpu.models.encoders as EN
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        jax.random, "gumbel",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    monkeypatch.setattr(
        EN, "gumbel_softmax",
        lambda key, logits, tau=1.0, axis=-1: jax.nn.softmax(logits / tau,
                                                             axis=axis))


def _interpret_kernels(monkeypatch, calls):
    """Route every fused kernel through interpret mode, counting calls."""
    import targetvae_tpu.kernels.decoder_pose as DP
    import targetvae_tpu.kernels.lifted_encoder as LE
    import targetvae_tpu.kernels.mix_heads as MH
    import targetvae_tpu.kernels.posterior as PK

    def wrap(mod, name, key, deterministic=False):
        orig = getattr(mod, name)

        def f(*a, **kw):
            calls[key] += 1
            kw["interpret"] = True
            if deterministic:
                kw["deterministic"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(mod, name, f)

    wrap(LE, "fused_lifted_encoder", "lift")
    wrap(MH, "fused_lift_act_mix_heads", "lift")
    wrap(PK, "fused_posterior", "posterior", deterministic=True)
    wrap(DP, "fused_pose_decoder", "decoder")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_ragged_tail_padded_loss_and_grads_match_unpadded(monkeypatch):
    """A 5-row batch padded to 8 with zero-weight repeated rows on a 4x2 mesh
    must (a) fire the Pallas kernels (inverted counter), (b) produce the same
    loss/metrics AND parameter gradients as the unpadded single-device kernel
    step (noise zeroed)."""
    model = _model()
    state0 = Trainer(model, TrainConfig(learning_rate=1e-3)).init_state(0)
    _zero_noise(monkeypatch)
    calls = {"lift": 0, "posterior": 0, "decoder": 0}
    _interpret_kernels(monkeypatch, calls)

    y5 = jax.random.uniform(jax.random.key(1), (5, 16, 16, 1))
    key = jax.random.key(3)

    single = Trainer(model, TrainConfig(learning_rate=1e-3,
                                        compute_dtype="bfloat16"))
    v0, g0 = jax.value_and_grad(
        lambda p: single._loss_fn(p, y5, key, None)[0])(state0.params)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=4, tp=2,
                                    compute_dtype="bfloat16"))
    tr.attach_mesh(mesh)
    assert tr._use_mesh_shardmap()
    y8 = jnp.concatenate([y5, jnp.broadcast_to(y5[:1], (3, 16, 16, 1))])
    w = jnp.concatenate([jnp.full((5,), 1.0 / 5), jnp.zeros((3,))])
    base = dict(calls)
    v1, g1 = jax.value_and_grad(
        lambda p: tr._loss_fn(p, y8, key, None, w)[0])(state0.params)

    fired = {k: calls[k] - base[k] for k in calls}
    assert all(v > 0 for v in fired.values()), fired

    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=2e-3, atol=0.05)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, a in flat0:
        bb = flat1[path]
        assert np.isfinite(np.asarray(bb)).all(), path
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), rtol=2e-2,
                                   atol=1e-3, err_msg=str(path))


def test_ragged_tail_sp_padded_matches_unpadded(monkeypatch):
    """Same property for the --sp kernel path (_loss_fn_sp with weights)."""
    model = _model()
    state0 = Trainer(model, TrainConfig(learning_rate=1e-3)).init_state(0)
    _zero_noise(monkeypatch)
    calls = {"lift": 0, "posterior": 0, "decoder": 0}
    _interpret_kernels(monkeypatch, calls)
    import targetvae_tpu.kernels.posterior as PK
    sp_calls = {"n": 0}
    orig_sp = PK.posterior_shard_partials

    def sp_post(*a, **kw):
        sp_calls["n"] += 1
        kw["interpret"] = True
        return orig_sp(*a, **kw)

    monkeypatch.setattr(PK, "posterior_shard_partials", sp_post)

    y5 = jax.random.uniform(jax.random.key(1), (5, 16, 16, 1))
    key = jax.random.key(3)
    single = Trainer(model, TrainConfig(learning_rate=1e-3,
                                        compute_dtype="bfloat16"))
    v0, _ = single._loss_fn(state0.params, y5, key, None)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=4, tp=2, sp=True,
                                    compute_dtype="bfloat16"))
    tr.attach_mesh(mesh)
    assert tr._use_sp_shardmap()
    y8 = jnp.concatenate([y5, jnp.broadcast_to(y5[:1], (3, 16, 16, 1))])
    w = jnp.concatenate([jnp.full((5,), 1.0 / 5), jnp.zeros((3,))])
    v1, _ = tr._loss_fn(state0.params, y8, key, None, w)
    assert sp_calls["n"] > 0
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=2e-3, atol=0.05)


def test_ragged_tail_hlo_no_model_axis_activation_allgather(monkeypatch):
    """The padded tail step's compiled HLO must contain no batch-scale
    activation all-gather over 'model' (the GSPMD fallback's signature,
    ROADMAP round-3 finding) — only param-scale TP boundaries."""
    model = _model()
    state0 = Trainer(model, TrainConfig(learning_rate=1e-3)).init_state(0)
    calls = {"lift": 0, "posterior": 0, "decoder": 0}
    _interpret_kernels(monkeypatch, calls)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    tr = Trainer(model, TrainConfig(learning_rate=1e-3, dp=4, tp=2,
                                    compute_dtype="bfloat16"))
    tr.attach_mesh(mesh)
    state = shard_state(mesh, state0)
    y = jax.random.uniform(jax.random.key(1), (8, 16, 16, 1))  # tail 5 -> 8
    ys, _ = shard_batch(mesh, y)
    w = jnp.concatenate([jnp.full((5,), 1.0 / 5), jnp.zeros((3,))])
    hlo = (jax.jit(tr._step_impl).lower(state, ys, None, w).compile()
           .as_text())

    # per-shard lift activation: (B/8) * H' * W' * R * K
    shard_lift = (8 // 8) * 16 * 16 * 4 * 32
    for dtype, dims, n in _collective_shapes(hlo, "all-gather"):
        # params (conv1 w: 32*1*1*9*9 = 2592 etc.) are gathered at the loss
        # boundary by design; nothing activation-scale may be
        assert n <= 4 * shard_lift, (dtype, dims, n)


def test_train_epoch_ragged_dataset_on_mesh_matches_single(monkeypatch):
    """train_epoch on a 42-row dataset (minibatch 16 -> 2 full + tail 10
    padded to 16) over a 4x2 mesh: every step fires kernels, and epoch
    metrics match the single-device kernel epoch (noise zeroed, identical
    shuffle from the same state key)."""
    model = _model()
    # init params BEFORE the noise patch (ops/fourier.py W init uses
    # jax.random.normal); epoch scans donate the state, so each trainer
    # gets its own identically-seeded copy
    _zero_noise(monkeypatch)
    calls = {"lift": 0, "posterior": 0, "decoder": 0}
    _interpret_kernels(monkeypatch, calls)

    data = jax.random.uniform(jax.random.key(1), (42, 16, 16, 1))

    single = Trainer(model, TrainConfig(learning_rate=1e-3,
                                        minibatch_size=16,
                                        compute_dtype="bfloat16"))
    _, m0 = single.train_epoch(single.init_state(0), data)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    tr = Trainer(model, TrainConfig(learning_rate=1e-3, minibatch_size=16,
                                    dp=4, tp=2, compute_dtype="bfloat16"))
    tr.attach_mesh(mesh)
    base = dict(calls)
    _, m1 = tr.train_epoch(tr.init_state(0), data)
    fired = {k: calls[k] - base[k] for k in calls}
    assert all(v > 0 for v in fired.values()), fired

    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=5e-3, atol=0.1)

    ev0 = single.eval_epoch(single.init_state(0), data)
    ev1 = tr.eval_epoch(tr.init_state(0), data)
    np.testing.assert_allclose(np.asarray(ev1), np.asarray(ev0),
                               rtol=5e-3, atol=0.1)


def test_streamed_ragged_epoch_on_mesh_single_compile(monkeypatch):
    """A mesh + --host-stream epoch over a 42-row dataset (batch 16 -> 2 full
    + tail 10, zero-weight padded to 16 by HostDataPipeline): ONE compiled
    step program for the whole epoch (the always-present weight operand means
    the tail shares the full batches' trace), kernels live on EVERY step
    including the tail (inverted counter), and epoch metrics equal the same
    shuffled batches fed unpadded to a single-device kernel trainer
    (VERDICT r4 #2)."""
    from targetvae_tpu.data.pipeline import HostDataPipeline
    from targetvae_tpu.parallel.mesh import batch_sharding

    model = _model()
    _zero_noise(monkeypatch)
    calls = {"lift": 0, "posterior": 0, "decoder": 0}
    _interpret_kernels(monkeypatch, calls)

    data = np.asarray(jax.random.uniform(jax.random.key(1), (42, 16, 16, 1)))

    # single-device baseline: identical batch order (the pipeline's host
    # shuffle is seed-deterministic), ragged tail fed unpadded
    order = np.random.RandomState(0).permutation(42)
    single = Trainer(model, TrainConfig(learning_rate=1e-3, minibatch_size=16,
                                        compute_dtype="bfloat16"))
    bare = [(jnp.asarray(data[order[lo:lo + 16]]), None)
            for lo in range(0, 42, 16)]
    _, m0 = single.train_epoch_stream(single.init_state(0), bare)

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    tr = Trainer(model, TrainConfig(learning_rate=1e-3, minibatch_size=16,
                                    dp=4, tp=2, compute_dtype="bfloat16"))
    tr.attach_mesh(mesh)
    assert tr._use_mesh_shardmap()
    state = shard_state(mesh, tr.init_state(0))
    pipe = HostDataPipeline(data, batch_size=16, seed=0,
                            sharding=batch_sharding(mesh))
    base = dict(calls)
    state, m1 = tr.train_epoch_stream(state, pipe.epoch(0))
    fired = {k: calls[k] - base[k] for k in calls}
    # kernels traced into the epoch's ONE compiled program (counters fire at
    # trace time, not per step)
    assert all(v > 0 for v in fired.values()), fired
    assert int(jax.device_get(state.step)) == 3
    # one program for full batches AND the padded tail: <=2 jit cache
    # entries (1 compile + jax's one-time output-sharding re-key, which
    # full-batch-only feeds also incur), where the pre-padding behavior
    # added a third, genuinely recompiled ragged-shape GSPMD-fallback entry
    n_entries = tr._train_step._cache_size()
    assert n_entries <= 2, n_entries
    # a second epoch — tail included — adds NO new program
    state, _ = tr.train_epoch_stream(state, pipe.epoch(1))
    assert tr._train_step._cache_size() == n_entries
    assert int(jax.device_get(state.step)) == 6

    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=5e-3, atol=0.1)
