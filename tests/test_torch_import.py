"""Reference torch-checkpoint import (utils/torch_import.py).

The reference saves whole pickled modules (torch.save of generator.sav /
inference.sav, src/utils.py:37-48); these tests build real reference modules,
save them the same way, and check the importer reconstructs the exact
(config, params) — weights compared against the independent test-helper
mapping used by the parity tests, configs field by field — plus an
end-to-end load through the clustering entry point.
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
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generator_import(tmp_path):
    from targetvae_tpu.utils.torch_import import generator_from_sav

    ref = import_reference_models()
    torch.manual_seed(0)
    gen = ref.SpatialGenerator(2, 32, n_out=3, num_layers=3,
                               fourier_expansion=True, sigma=0.05)
    path = tmp_path / "generator.sav"
    torch.save(gen.eval(), path)

    cfg, params = generator_from_sav(str(path))
    assert cfg.z_dim == 2 and cfg.hidden_dim == 32 and cfg.n_out == 3
    assert cfg.num_layers == 3 and cfg.fourier_expansion
    assert cfg.fourier_sigma == pytest.approx(0.05)
    assert cfg.activation == "leakyrelu" and not cfg.resid
    _assert_tree_equal(params, generator_params_from_torch(gen))


def test_generator_import_resid_tanh(tmp_path):
    from targetvae_tpu.utils.torch_import import generator_from_sav

    ref = import_reference_models()
    torch.manual_seed(1)
    gen = ref.SpatialGenerator(2, 16, num_layers=2, resid=True,
                               activation=torch.nn.Tanh)
    path = tmp_path / "generator.sav"
    torch.save(gen.eval(), path)

    cfg, params = generator_from_sav(str(path))
    assert cfg.resid and cfg.activation == "tanh"
    assert not cfg.fourier_expansion and cfg.num_layers == 2
    _assert_tree_equal(params, generator_params_from_torch(gen))


def test_encoder_import_mode_a(tmp_path):
    from targetvae_tpu.utils.torch_import import encoder_from_sav

    ref = import_reference_models()
    torch.manual_seed(2)
    enc = ref.InferenceNetwork_UnimodalTranslation_UnimodalRotation(
        12 * 12, 5, 64, num_layers=2)
    path = tmp_path / "inference.sav"
    torch.save(enc.eval(), path)

    cfg, params = encoder_from_sav(str(path))
    assert cfg.mode == "A"
    assert cfg.image_dim == 12 and cfg.in_channels == 1
    assert cfg.z_dim == 2 and cfg.kernels_num == 64 and cfg.num_layers == 2
    _assert_tree_equal(params, encoder_params_from_torch(enc, "A"))


@pytest.mark.parametrize("groupconv", [0, 4])
def test_encoder_import_mode_b(tmp_path, groupconv):
    from targetvae_tpu.utils.torch_import import encoder_from_sav

    ref = import_reference_models()
    torch.manual_seed(3)
    enc = ref.InferenceNetwork_AttentionTranslation_UnimodalRotation(
        11, 1, 3, kernels_num=16, groupconv=groupconv)
    path = tmp_path / "inference.sav"
    torch.save(enc.eval(), path)

    cfg, params = encoder_from_sav(str(path))
    assert cfg.mode == "B"
    assert cfg.image_dim == 11 and cfg.z_dim == 3
    assert cfg.kernels_num == 16 and cfg.groupconv == groupconv
    _assert_tree_equal(params, encoder_params_from_torch(enc, "B"))


@pytest.mark.parametrize("rot_refinement", [False, True])
def test_encoder_import_mode_c(tmp_path, rot_refinement):
    from targetvae_tpu.utils.torch_import import encoder_from_sav

    ref = import_reference_models()
    torch.manual_seed(4)
    enc = ref.InferenceNetwork_AttentionTranslation_AttentionRotation(
        12, 1, 2, kernels_num=16, kernels_size=7, padding=3, groupconv=4,
        rot_refinement=rot_refinement, theta_prior=np.pi / 2,
        normal_prior_over_r=True)
    path = tmp_path / "inference.sav"
    torch.save(enc.eval(), path)

    cfg, params = encoder_from_sav(str(path))
    assert cfg.mode == "C"
    assert cfg.r_inf == ("attention+offsets" if rot_refinement
                         else "attention")
    assert cfg.image_dim == 12 and cfg.z_dim == 2
    assert cfg.kernels_num == 16 and cfg.kernels_size == 7
    assert cfg.padding == 3 and cfg.groupconv == 4
    assert cfg.theta_prior == pytest.approx(np.pi / 2)
    assert cfg.normal_prior_over_r
    _assert_tree_equal(params, encoder_params_from_torch(enc, "C"))


def test_load_encoder_accepts_torch_sav(tmp_path):
    """End-to-end: the clustering entry point transparently imports a
    reference inference.sav and the embedding runs finite on it."""
    import jax.numpy as jnp

    from targetvae_tpu.cli.clustering_common import load_encoder

    ref = import_reference_models()
    torch.manual_seed(5)
    enc = ref.InferenceNetwork_AttentionTranslation_AttentionRotation(
        12, 1, 2, kernels_num=16, kernels_size=7, padding=3, groupconv=4,
        rot_refinement=True, theta_prior=np.pi)
    path = tmp_path / "inference.sav"
    torch.save(enc.eval(), path)

    model, params = load_encoder(str(path))
    y = np.random.default_rng(0).uniform(size=(4, 12, 12, 1)).astype(
        np.float32)
    out = model.embed(params, jnp.asarray(y))
    assert out["z_content"].shape == (4, 4)
    assert out["theta_mu"].shape == (4, 1)
    assert out["dx"].shape == (4, 2)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_is_torch_checkpoint_discriminates(tmp_path):
    from targetvae_tpu.train.checkpoint import save_checkpoint
    from targetvae_tpu.utils.config import ModelConfig
    from targetvae_tpu.utils.torch_import import is_torch_checkpoint

    torch_path = tmp_path / "t.sav"
    torch.save(torch.nn.Linear(2, 2), torch_path)
    assert is_torch_checkpoint(str(torch_path))

    ours = tmp_path / "ours.sav"
    save_checkpoint(str(ours), {"x": np.zeros(2)}, ModelConfig())
    assert not is_torch_checkpoint(str(ours))


def test_reconstruct_tool_on_reference_savs(tmp_path):
    """tools/reconstruct.py renders reconstructions straight from a pair of
    reference-saved pickled modules (mixed-format loading path)."""
    import sys

    ref = import_reference_models()
    torch.manual_seed(6)
    enc = ref.InferenceNetwork_AttentionTranslation_AttentionRotation(
        12, 1, 2, kernels_num=16, kernels_size=7, padding=3, groupconv=4,
        rot_refinement=True, theta_prior=np.pi)
    gen = ref.SpatialGenerator(2, 16, num_layers=2, fourier_expansion=True,
                               sigma=2.0 / 11)
    torch.save(enc.eval(), tmp_path / "inference.sav")
    torch.save(gen.eval(), tmp_path / "generator.sav")
    np.save(tmp_path / "imgs.npy",
            np.random.default_rng(0).uniform(
                size=(4, 12, 12)).astype(np.float32))

    sys.path.insert(0, "/root/repo")
    from tools.reconstruct import main as reconstruct_main
    out = tmp_path / "recon.png"
    reconstruct_main(["--path-to-encoder", str(tmp_path / "inference.sav"),
                      "--path-to-generator", str(tmp_path / "generator.sav"),
                      "--images", str(tmp_path / "imgs.npy"),
                      "--n", "4", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0
