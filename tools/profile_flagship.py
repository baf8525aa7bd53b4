#!/usr/bin/env python
"""Component-level timing of the flagship (MNIST-U P8) training step on TPU.

Times, per component at flagship shapes (batch 100, bf16 kernel path):
  step        full train step (fwd ELBO + bwd + Adam)
  encoder     fused lifted-encoder kernel fwd+bwd (param grads)
  posterior   fused posterior kernel fwd+bwd
  dec_fwd     pose decoder forward
  dec_full    pose decoder fwd+bwd w.r.t. (theta, dx, z, params)
  dec_nopose  same but theta/dx stop-gradient'ed — the dec_full - dec_nopose
              gap is the XLA-side pose-gradient chain through pose_tables
Used to decide kernel work; results recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def timeit(fn, *args, steps=30):
    out = fn(*args)
    jax.device_get(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(out)
    return (time.time() - t0) / steps * 1e3


def _scalarize(g):
    """Reduce a gradient pytree to one scalar ON DEVICE. Returning raw grad
    arrays from a microbench jit makes device_get pull MBs through the axon
    tunnel and inflates timings by 10-70x (measured: the posterior kernel
    'cost' 146 ms with raw outputs, 2 ms reduced)."""
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(g))


def main(batch=100):
    from __graft_entry__ import _flagship_config
    from targetvae_tpu.models import TargetVAE
    from targetvae_tpu.models import encoders as EN
    from targetvae_tpu.train import Trainer
    from targetvae_tpu.utils.config import TrainConfig

    cfg = _flagship_config()
    model = TargetVAE(cfg)
    trainer = Trainer(model, TrainConfig(learning_rate=2e-4,
                                         compute_dtype="bfloat16"))
    state = trainer.init_state(0)
    y = jax.random.uniform(jax.random.key(1), (batch, 50, 50, 1))

    def step(state, y):
        return trainer._train_step(state, y)

    s, m = step(state, y)
    jax.device_get(m)
    t0 = time.time()
    for _ in range(30):
        s, m = step(s, y)
    jax.device_get(m)
    print(f"step       {(time.time() - t0) / 30 * 1e3:7.2f} ms")

    params = jax.tree.map(jnp.copy, s.params)  # s is live; state was donated
    ecfg = cfg.encoder

    @jax.jit
    def enc_fwdbwd(p, y):
        # the tier the step actually runs since round 3 (conv1d lift +
        # fused mix_heads); the legacy patch kernel is _mode_c_kernel
        def loss(p):
            outs = EN._mode_c_xla_matmul(p["encoder"], ecfg, y)
            return sum(jnp.sum(o.astype(jnp.float32) * 1e-3) for o in outs)
        return _scalarize(jax.grad(loss)(p))

    print(f"encoder    {timeit(enc_fwdbwd, params, y):7.2f} ms")

    # pose decoder at flagship shapes
    from targetvae_tpu.kernels.decoder_pose import fused_pose_decoder
    B = batch
    key = jax.random.key(3)
    theta = jax.random.normal(key, (B,))
    dx = jax.random.normal(jax.random.key(4), (B, 2)) * 0.1
    z = jax.random.normal(jax.random.key(5), (B, cfg.generator.z_dim))
    gp = params["generator"]

    @jax.jit
    def dec_fwd(theta, dx, z, gp):
        return fused_pose_decoder(theta, dx, z, gp, cfg.generator, 50)

    print(f"dec_fwd    {timeit(dec_fwd, theta, dx, z, gp):7.2f} ms")

    @jax.jit
    def dec_full(theta, dx, z, gp):
        def loss(a):
            t, d, zz, p = a
            return jnp.sum(fused_pose_decoder(t, d, zz, p, cfg.generator, 50))
        return _scalarize(jax.grad(loss)((theta, dx, z, gp)))

    print(f"dec_full   {timeit(dec_full, theta, dx, z, gp):7.2f} ms")

    @jax.jit
    def dec_nopose(theta, dx, z, gp):
        def loss(a):
            zz, p = a
            t = jax.lax.stop_gradient(theta)
            d = jax.lax.stop_gradient(dx)
            return jnp.sum(fused_pose_decoder(t, d, zz, p, cfg.generator, 50))
        return _scalarize(jax.grad(loss)((z, gp)))

    print(f"dec_nopose {timeit(dec_nopose, theta, dx, z, gp):7.2f} ms")


def main_particles(batch=50):
    """Big-k (conv1d) encoder tier at the EMPIAR scale: fwd vs fwd+bwd."""
    import numpy as np
    from targetvae_tpu.models import encoders as EN
    from targetvae_tpu.models.encoders import encoder_init
    from targetvae_tpu.utils.config import EncoderConfig

    cfg = EncoderConfig(t_inf="attention", r_inf="attention+offsets",
                        image_dim=110, in_channels=1, z_dim=2,
                        kernels_num=128, kernels_size=64, padding=16,
                        groupconv=8, theta_prior=np.pi)
    params = encoder_init(jax.random.key(0), cfg)
    y = jax.random.uniform(jax.random.key(1), (batch, 110, 110, 1))

    @jax.jit
    def enc_fwd(p, y):
        outs = EN._mode_c_xla_matmul(p, cfg, y)
        return sum(jnp.sum(o.astype(jnp.float32) * 1e-3) for o in outs)

    @jax.jit
    def enc_fwdbwd(p, y):
        return _scalarize(jax.grad(lambda p: enc_fwd.__wrapped__(p, y))(p))

    print(f"enc_fwd    {timeit(enc_fwd, params, y):7.2f} ms")
    print(f"enc_fwdbwd {timeit(enc_fwdbwd, params, y):7.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "particles":
        main_particles()
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
