"""Reference torch-checkpoint export (utils/torch_export.py).

Round trip both mapping directions: export our params to a pickled .sav,
torch.load it with the REAL reference classes on sys.path (what a reference
user does, clustering_mnist.py:307-308), then (a) map the loaded module's
weights back with the parity-test helpers and require exact equality with
the original params, and (b) run the reference's own forward on the loaded
module to prove the pickled instances bind to the real classes.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.helpers import (encoder_params_from_torch,
                           generator_params_from_torch,
                           import_reference_models)

torch = pytest.importorskip("torch")


def _assert_tree_equal(a, b):
    if isinstance(a, dict):
        assert set(a) == set(b)
        for k in a:
            _assert_tree_equal(a[k], b[k])
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b)
        for x, y in zip(a, b):
            _assert_tree_equal(x, y)
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0)


def _load_ref(path):
    import_reference_models()  # real src.models on sys.path
    return torch.load(path, map_location="cpu", weights_only=False)


def test_export_encoder_mode_c_round_trip(tmp_path):
    import jax

    from targetvae_tpu.models.encoders import encoder_init
    from targetvae_tpu.utils.config import EncoderConfig
    from targetvae_tpu.utils.torch_export import export_encoder_sav

    cfg = EncoderConfig(t_inf="attention", r_inf="attention+offsets",
                        image_dim=12, in_channels=1, z_dim=2,
                        kernels_num=16, kernels_size=7, padding=3,
                        groupconv=4, theta_prior=np.pi / 2,
                        normal_prior_over_r=True)
    params = jax.tree.map(np.asarray, encoder_init(jax.random.key(0), cfg))
    path = tmp_path / "inference_torch.sav"
    export_encoder_sav(str(path), cfg, params)

    enc = _load_ref(path)
    assert type(enc).__name__ == \
        "InferenceNetwork_AttentionTranslation_AttentionRotation"
    assert enc.theta_prior == pytest.approx(np.pi / 2)
    assert enc.rot_refinement and enc.normal_prior_over_r
    assert enc.groupconv == 4 and enc.kernels_size == 7 and enc.padding == 3
    _assert_tree_equal(encoder_params_from_torch(enc, "C"), params)

    # the reference's own forward runs on the loaded module
    y = torch.randn(3, 1, 12, 12)
    out = enc(y, "cpu")
    assert all(torch.isfinite(o).all() for o in out if o is not None)


@pytest.mark.parametrize("groupconv", [0, 4])
def test_export_encoder_mode_b_round_trip(tmp_path, groupconv):
    import jax

    from targetvae_tpu.models.encoders import encoder_init
    from targetvae_tpu.utils.config import EncoderConfig
    from targetvae_tpu.utils.torch_export import export_encoder_sav

    cfg = EncoderConfig(t_inf="attention", r_inf="unimodal", image_dim=11,
                        in_channels=1, z_dim=3, kernels_num=16,
                        groupconv=groupconv)
    params = jax.tree.map(np.asarray, encoder_init(jax.random.key(1), cfg))
    path = tmp_path / "inference_torch.sav"
    export_encoder_sav(str(path), cfg, params)

    enc = _load_ref(path)
    assert type(enc).__name__ == \
        "InferenceNetwork_AttentionTranslation_UnimodalRotation"
    _assert_tree_equal(encoder_params_from_torch(enc, "B"), params)
    out = enc(torch.randn(2, 1, 11, 11), "cpu")
    assert all(torch.isfinite(o).all() for o in out if o is not None)


def test_export_encoder_mode_a_round_trip(tmp_path):
    import jax

    from targetvae_tpu.models.encoders import encoder_init
    from targetvae_tpu.utils.config import EncoderConfig
    from targetvae_tpu.utils.torch_export import export_encoder_sav

    cfg = EncoderConfig(t_inf="unimodal", r_inf="unimodal", image_dim=12,
                        z_dim=2, kernels_num=64, num_layers=2)
    params = jax.tree.map(np.asarray, encoder_init(jax.random.key(2), cfg))
    path = tmp_path / "inference_torch.sav"
    export_encoder_sav(str(path), cfg, params)

    enc = _load_ref(path)
    assert type(enc).__name__ == \
        "InferenceNetwork_UnimodalTranslation_UnimodalRotation"
    assert enc.n == 144 and enc.latent_dim == 5
    _assert_tree_equal(encoder_params_from_torch(enc, "A"), params)
    zm, zs = enc(torch.randn(2, 144))
    assert torch.isfinite(zm).all() and torch.isfinite(zs).all()


def test_export_generator_round_trip_and_forward_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from targetvae_tpu.models.generator import generator_apply, generator_init
    from targetvae_tpu.utils.config import GeneratorConfig
    from targetvae_tpu.utils.torch_export import export_generator_sav

    cfg = GeneratorConfig(z_dim=2, hidden_dim=16, n_out=1, num_layers=2,
                          fourier_expansion=True, fourier_sigma=0.2)
    params = jax.tree.map(np.asarray, generator_init(jax.random.key(3), cfg))
    path = tmp_path / "generator_torch.sav"
    export_generator_sav(str(path), cfg, params)

    gen = _load_ref(path)
    assert type(gen).__name__ == "SpatialGenerator"
    _assert_tree_equal(generator_params_from_torch(gen), params)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 9, 2)).astype(np.float32)
    z = rng.standard_normal((2, 2)).astype(np.float32)
    ref = gen(torch.from_numpy(x), torch.from_numpy(z)).detach().numpy()
    ours = np.asarray(generator_apply(params, cfg, jnp.asarray(x),
                                      jnp.asarray(z)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_export_checkpoint_run_dir(tmp_path):
    import jax

    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.train.checkpoint import save_checkpoint
    from targetvae_tpu.utils.config import (EncoderConfig, GeneratorConfig,
                                            ModelConfig)
    from targetvae_tpu.utils.torch_export import export_checkpoint

    cfg = ModelConfig(
        generator=GeneratorConfig(z_dim=2, hidden_dim=16),
        encoder=EncoderConfig(image_dim=12, z_dim=2, kernels_num=16,
                              kernels_size=7, padding=3, groupconv=4))
    params = jax.tree.map(np.asarray, TargetVAE(cfg).init(jax.random.key(0)))
    run = tmp_path / "run"
    run.mkdir()
    save_checkpoint(str(run / "inference.sav"), params, cfg)
    save_checkpoint(str(run / "generator.sav"), params, cfg)

    written = export_checkpoint(str(run))
    assert len(written) == 2
    enc = _load_ref(written[0])
    gen = _load_ref(written[1])
    assert type(enc).__name__.startswith("InferenceNetwork")
    assert type(gen).__name__ == "SpatialGenerator"
