"""Sanity checks for the analytic FLOP accounting (utils/flops.py).

The anchors come from independently measured numbers in BENCH_NOTES.md:
the flagship lift conv forward is ~244 GFLOP, the cryo-EM-scale lift conv
forward is ~2.62 TFLOP, and the full EMPIAR-shaped step is ~8 TFLOP at
batch 50 — all stated there from HLO/profile measurements before this module
existed.
"""

import numpy as np

from targetvae_tpu.utils.config import (EncoderConfig, GeneratorConfig,
                                        LikelihoodConfig, ModelConfig)
from targetvae_tpu.utils.flops import (decoder_flops, encoder_flops, mfu,
                                       step_flops)


def _flagship():
    return ModelConfig(
        generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=1,
                                  num_layers=2, fourier_expansion=True,
                                  fourier_sigma=2.0 / 49),
        encoder=EncoderConfig(t_inf="attention", r_inf="attention+offsets",
                              image_dim=50, in_channels=1, z_dim=2,
                              kernels_num=128, kernels_size=28, padding=8,
                              groupconv=8, theta_prior=np.pi),
        likelihood=LikelihoodConfig(kind="bernoulli"))


def _particles():
    return ModelConfig(
        generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=1,
                                  num_layers=2, fourier_expansion=True,
                                  fourier_sigma=2.0 / 109),
        encoder=EncoderConfig(t_inf="attention", r_inf="attention+offsets",
                              image_dim=110, in_channels=1, z_dim=2,
                              kernels_num=128, kernels_size=64, padding=16,
                              groupconv=8, theta_prior=np.pi),
        likelihood=LikelihoodConfig(kind="gaussian", mask_radius=45))


def test_flagship_lift_conv_matches_measured_anchor():
    # BENCH_NOTES: "the 244-GFLOP lift" (forward, batch 100). The accounting
    # stores fwd + wgrad = 2x forward.
    parts = encoder_flops(_flagship(), 100)
    fwd = parts["lift_conv"] / 2
    assert abs(fwd - 244e9) / 244e9 < 0.03


def test_empiar_lift_conv_matches_measured_anchor():
    # BENCH_NOTES: "the whole 2.62-TFLOP lift" (forward, batch 50)
    parts = encoder_flops(_particles(), 50)
    fwd = parts["lift_conv"] / 2
    assert abs(fwd - 2.62e12) / 2.62e12 < 0.03


def test_empiar_step_total_matches_measured_anchor():
    # BENCH_NOTES: "inherently ~7.8 TFLOP/step at batch 50"
    total = step_flops(_particles(), 50, ctf_dim=109)["total"]
    assert 7e12 < total < 9.5e12


def test_mode_b_counts_single_rotation_when_groupconv_0():
    cfg = _flagship()
    ecfg_b = EncoderConfig(t_inf="attention", r_inf="unimodal",
                           image_dim=50, in_channels=1, z_dim=2,
                           kernels_num=128, groupconv=0,
                           theta_prior=np.pi)
    cfg_b = ModelConfig(generator=cfg.generator, encoder=ecfg_b,
                        likelihood=cfg.likelihood)
    parts = encoder_flops(cfg_b, 100)
    # k = image_dim = 50, R = 1, H' = 51
    assert parts["lift_conv"] == 2 * 2 * 100 * 51 * 51 * 2500 * 128


def test_mode_a_mlp_counts():
    ecfg = EncoderConfig(t_inf="unimodal", r_inf="unimodal", image_dim=50,
                         in_channels=1, z_dim=2, kernels_num=500,
                         num_layers=2, theta_prior=np.pi)
    parts = encoder_flops(ModelConfig(encoder=ecfg), 10)
    n, h, latent = 2500, 500, 5
    expect = (2 * 10 * n * h * 2                      # data input: x2
              + 2 * 10 * (h * h + h * 2 * latent) * 3)
    assert parts["encoder_mlp"] == expect


def test_decoder_scales_with_pixels_and_depth():
    cfg = _flagship()
    base = decoder_flops(cfg, 100)["decoder_mlp"]
    deeper = ModelConfig(
        generator=GeneratorConfig(z_dim=2, hidden_dim=512, n_out=1,
                                  num_layers=4, fourier_expansion=True),
        encoder=cfg.encoder, likelihood=cfg.likelihood)
    assert decoder_flops(deeper, 100)["decoder_mlp"] > base
    assert decoder_flops(cfg, 200)["decoder_mlp"] > 1.9 * base


def test_mfu():
    assert abs(mfu(197e12, 1.0) - 1.0) < 1e-9
    assert abs(mfu(1.795e12, 0.0195) - 0.467) < 0.01
