"""Generator and encoder forward parity vs the reference modules."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetvae_tpu.models.encoders import (
    encoder_apply, encoder_init, group_offsets, rotation_log_prior)
from targetvae_tpu.models.generator import generator_apply, generator_init
from targetvae_tpu.utils.config import EncoderConfig, GeneratorConfig
from tests.conftest import requires_reference
from tests.helpers import (
    encoder_params_from_torch, generator_params_from_torch,
    import_reference_models, to_bhwc)


def test_group_offsets_match_reference_tables():
    np.testing.assert_allclose(
        group_offsets(4), [0, np.pi / 2, np.pi, -np.pi / 2], atol=1e-6)
    np.testing.assert_allclose(
        group_offsets(8),
        [0, np.pi / 4, np.pi / 2, 3 * np.pi / 4, np.pi,
         -3 * np.pi / 4, -np.pi / 2, -np.pi / 4], atol=1e-6)
    np.testing.assert_allclose(
        group_offsets(16),
        [0, np.pi / 8, np.pi / 4, 3 * np.pi / 8, np.pi / 2, 5 * np.pi / 8,
         3 * np.pi / 4, 7 * np.pi / 8, np.pi, -7 * np.pi / 8, -3 * np.pi / 4,
         -5 * np.pi / 8, -np.pi / 2, -3 * np.pi / 8, -np.pi / 4, -np.pi / 8],
        atol=1e-6)


@requires_reference
@pytest.mark.parametrize("fourier,resid,num_layers,n_out",
                         [(False, False, 2, 1), (True, False, 2, 1),
                          (False, True, 3, 3), (True, True, 2, 2)])
def test_generator_parity(fourier, resid, num_layers, n_out):
    torch = pytest.importorskip("torch")
    ref_models = import_reference_models()

    torch.manual_seed(0)
    zd, hd = 2, 32
    gen_t = ref_models.SpatialGenerator(zd, hd, n_out=n_out,
                                        num_layers=num_layers, resid=resid,
                                        fourier_expansion=fourier, sigma=0.05)
    cfg = GeneratorConfig(z_dim=zd, hidden_dim=hd, n_out=n_out,
                          num_layers=num_layers, resid=resid,
                          fourier_expansion=fourier, fourier_sigma=0.05)
    params = generator_params_from_torch(gen_t)

    rng = np.random.RandomState(1)
    x = rng.randn(4, 25, 2).astype(np.float32)
    z = rng.randn(4, zd).astype(np.float32)
    ref = gen_t(torch.from_numpy(x), torch.from_numpy(z)).detach().numpy()
    mine = np.asarray(generator_apply(
        jax.tree.map(jnp.asarray, params), cfg, jnp.asarray(x), jnp.asarray(z)))
    np.testing.assert_allclose(mine, ref, atol=2e-4)


@requires_reference
def test_encoder_mode_a_parity():
    torch = pytest.importorskip("torch")
    ref_models = import_reference_models()

    torch.manual_seed(0)
    d, zd = 12, 2
    inf_dim = zd + 3
    enc_t = ref_models.InferenceNetwork_UnimodalTranslation_UnimodalRotation(
        d * d, inf_dim, 24, num_layers=2)
    cfg = EncoderConfig(t_inf="unimodal", r_inf="unimodal", image_dim=d,
                        z_dim=zd, kernels_num=24, num_layers=2, groupconv=0)
    params = encoder_params_from_torch(enc_t, "A")

    rng = np.random.RandomState(1)
    y = rng.rand(3, d, d, 1).astype(np.float32)
    zm_ref, zs_ref = enc_t(torch.from_numpy(y.reshape(3, -1)))
    out = encoder_apply(jax.tree.map(jnp.asarray, params), cfg,
                        jnp.asarray(y), key=None)
    np.testing.assert_allclose(out["z_mu"], zm_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(out["z_logstd"], zs_ref.detach().numpy(), atol=1e-5)


@requires_reference
@pytest.mark.parametrize("groupconv", [0, 4])
def test_encoder_mode_b_parity(groupconv):
    torch = pytest.importorskip("torch")
    ref_models = import_reference_models()

    torch.manual_seed(0)
    d, zd, kn = 10, 2, 16
    enc_t = ref_models.InferenceNetwork_AttentionTranslation_UnimodalRotation(
        d, 1, zd, kernels_num=kn, groupconv=groupconv)
    cfg = EncoderConfig(t_inf="attention", r_inf="unimodal", image_dim=d,
                        z_dim=zd, kernels_num=kn, groupconv=groupconv)
    params = encoder_params_from_torch(enc_t, "B")

    rng = np.random.RandomState(1)
    y = rng.rand(2, d, d, 1).astype(np.float32)
    attn_ref, _, theta_ref, z_ref = enc_t(
        torch.from_numpy(np.transpose(y, (0, 3, 1, 2))), "cpu")
    out = encoder_apply(jax.tree.map(jnp.asarray, params), cfg,
                        jnp.asarray(y), key=None)

    np.testing.assert_allclose(out["attn"], attn_ref.detach().numpy()[:, 0],
                               atol=1e-4)
    ref_theta = theta_ref.detach().numpy()
    np.testing.assert_allclose(out["theta_mu"], ref_theta[:, 0], atol=1e-4)
    np.testing.assert_allclose(out["theta_logstd"], ref_theta[:, 1], atol=1e-4)
    ref_z = z_ref.detach().numpy()                       # (B, 2zd, H, W)
    mine_zmu = np.transpose(np.asarray(out["z_mu"]), (0, 3, 1, 2))
    np.testing.assert_allclose(mine_zmu, ref_z[:, :zd], atol=1e-4)


@requires_reference
@pytest.mark.parametrize("rot_refinement,normal_prior,R",
                         [(True, True, 4), (True, False, 4),
                          (False, False, 4), (True, False, 16)])
def test_encoder_mode_c_parity(rot_refinement, normal_prior, R):
    torch = pytest.importorskip("torch")
    ref_models = import_reference_models()

    torch.manual_seed(0)
    d, zd, kn, ks, pad = 12, 2, 16, 8, 3
    r_inf = "attention+offsets" if rot_refinement else "attention"
    enc_t = ref_models.InferenceNetwork_AttentionTranslation_AttentionRotation(
        d, 1, zd, kernels_num=kn, kernels_size=ks, padding=pad, groupconv=R,
        rot_refinement=rot_refinement, theta_prior=np.pi / 4,
        normal_prior_over_r=normal_prior)
    cfg = EncoderConfig(t_inf="attention", r_inf=r_inf, image_dim=d, z_dim=zd,
                        kernels_num=kn, kernels_size=ks, padding=pad,
                        groupconv=R, theta_prior=np.pi / 4,
                        normal_prior_over_r=normal_prior)
    params = encoder_params_from_torch(enc_t, "C")

    rng = np.random.RandomState(1)
    y = rng.rand(2, d, d, 1).astype(np.float32)
    attn_ref, q_ref, p_r_ref, _, off_ref, theta_ref, z_ref = enc_t(
        torch.from_numpy(np.transpose(y, (0, 3, 1, 2))), "cpu")
    out = encoder_apply(jax.tree.map(jnp.asarray, params), cfg,
                        jnp.asarray(y), key=None)

    tr = lambda a: np.transpose(np.asarray(a), (0, 3, 1, 2))  # BHWR -> BRHW
    np.testing.assert_allclose(tr(out["attn"]), attn_ref.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(tr(out["q"]), q_ref.detach().numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["p_r"]).ravel(),
                               p_r_ref.detach().numpy().ravel(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["offsets"]),
                               off_ref.detach().numpy(), atol=1e-6)
    ref_theta = theta_ref.detach().numpy()               # (B, 2, R, H, W)
    np.testing.assert_allclose(tr(out["theta_mu"]), ref_theta[:, 0], atol=1e-4)
    np.testing.assert_allclose(tr(out["theta_logstd"]), ref_theta[:, 1],
                               atol=1e-4)
    ref_z = z_ref.detach().numpy()                        # (B, 2zd, R, H, W)
    mine_zmu = np.transpose(np.asarray(out["z_mu"]), (0, 4, 3, 1, 2))
    np.testing.assert_allclose(mine_zmu, ref_z[:, :zd], atol=1e-4)


def test_encoder_init_shapes():
    for mode_cfg in [
        EncoderConfig(t_inf="unimodal", r_inf="unimodal", image_dim=8, z_dim=2),
        EncoderConfig(t_inf="attention", r_inf="unimodal", image_dim=8,
                      z_dim=2, groupconv=0),
        EncoderConfig(t_inf="attention", r_inf="attention+offsets", image_dim=8,
                      z_dim=2, kernels_size=5, padding=2, groupconv=4),
    ]:
        params = encoder_init(jax.random.key(0), mode_cfg)
        y = jnp.zeros((2, 8, 8, 1))
        out = encoder_apply(params, mode_cfg, y, key=jax.random.key(1))
        assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


def test_lift_conv_custom_wgrad_matches_autodiff():
    """The hand-written weight-grad conv (_lift_wgrad, native-layout
    ConvDimensionNumbers) must equal XLA's own rhs-transpose of the lift
    conv bit-for-bit at f32 (same contraction, same accumulation order up
    to conv-emitter scheduling)."""
    from targetvae_tpu.models.encoders import _lift_conv_op

    rng = np.random.default_rng(0)
    cols, ck, n2, rk, k = 24, 12, 30, 16, 9
    lhs = jnp.asarray(rng.standard_normal((cols, ck, n2)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((rk, ck, k)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n2 - k + 1, cols, rk)), jnp.float32)

    def ref_loss(rhs):
        y = jax.lax.conv_general_dilated(
            jax.lax.stop_gradient(lhs), rhs, (1,), "VALID",
            dimension_numbers=("NCW", "OIW", "WNC"))
        return jnp.sum(y * g)

    def custom_loss(rhs):
        return jnp.sum(_lift_conv_op(jax.lax.stop_gradient(lhs), rhs) * g)

    ref = jax.grad(ref_loss)(rhs)
    got = jax.grad(custom_loss)(rhs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # forward unchanged
    np.testing.assert_allclose(
        np.asarray(_lift_conv_op(lhs, rhs)),
        np.asarray(jax.lax.conv_general_dilated(
            lhs, rhs, (1,), "VALID",
            dimension_numbers=("NCW", "OIW", "WNC"))), rtol=1e-5, atol=1e-5)
