#!/usr/bin/env python
"""Reproduce the pose-decoder theta-grad tolerance calibration in-repo.

tests/test_kernels.py::test_pose_decoder_grads uses a 0.2 relative tolerance
on the theta/dx gradient leaves with the rationale that ~0.13-0.2 is the
bf16 CANCELLATION FLOOR of those leaves, not kernel error (the original
measurement compared two 1-ulp-equivalent in-kernel feature-build orders
that no longer exist; ADVICE r4 asked for the floor claim to stay
reproducible). This script re-derives the floor without the deleted
variants: it perturbs the f32 REFERENCE decoder's parameters by one bf16
ulp of relative noise — the magnitude by which any two bf16-equivalent
build orders may differ — and measures the induced theta-grad distance of
the reference AGAINST ITSELF, alongside the kernel-vs-reference distance
the test actually bounds.

Run on any backend: python tools/calibrate_pose_tol.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main() -> None:
    from targetvae_tpu.kernels.decoder_pose import fused_pose_decoder
    from targetvae_tpu.models.generator import generator_apply, generator_init
    from targetvae_tpu.ops.coords import image_grid, transform_coords
    from targetvae_tpu.utils.config import GeneratorConfig

    # the exact shape of the loosened test case (num_layers=2, n_out=1)
    n, zd = 18, 2
    cfg = GeneratorConfig(z_dim=zd, hidden_dim=64, num_layers=2, n_out=1,
                          fourier_expansion=True, fourier_sigma=2 / (n - 1))
    params = generator_init(jax.random.key(0), cfg)
    theta = jax.random.normal(jax.random.key(1), (3,))
    dx = jax.random.normal(jax.random.key(2), (3, 2)) * 0.2
    z = jax.random.normal(jax.random.key(3), (3, zd))
    grid = jnp.asarray(image_grid(n))

    def ref(t, d, zz, p):
        return generator_apply(p, cfg, transform_coords(grid, d, t), zz)

    def ker(t, d, zz, p):
        return fused_pose_decoder(t, d, zz, p, cfg, n, tr=8, interpret=True)

    def grads(fn, p):
        return jax.grad(lambda t, d, zz, pp: jnp.sum(jnp.sin(fn(t, d, zz,
                                                                pp))),
                        argnums=(0, 1, 2, 3))(theta, dx, z, p)

    def rel(a, b):
        return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))

    g_ref = grads(ref, params)
    g_ker = grads(ker, params)

    # one bf16 ulp (2^-8) of relative parameter noise: the scale on which
    # any two bf16-equivalent evaluation orders of the same math differ
    ulp = 2.0 ** -8
    leaves, tree = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    pert = jax.tree_util.tree_unflatten(tree, [
        leaf * (1.0 + ulp * jax.random.rademacher(k, leaf.shape,
                                                  jnp.float32))
        for leaf, k in zip(leaves, keys)])
    g_ulp = grads(ref, pert)

    names = ["theta", "dx", "z"]
    print("leaf   kernel-vs-ref   ref-vs-ref@1ulp   (test bound: 0.2 on "
          "theta/dx, 0.15 on z/params)")
    for i, nm in enumerate(names):
        print(f"{nm:6s} {rel(g_ref[i], g_ker[i]):13.4f}  "
              f"{rel(g_ref[i], g_ulp[i]):15.4f}")
    pr = [rel(a, b) for a, b in zip(jax.tree.leaves(g_ref[3]),
                                    jax.tree.leaves(g_ker[3]))]
    pu = [rel(a, b) for a, b in zip(jax.tree.leaves(g_ref[3]),
                                    jax.tree.leaves(g_ulp[3]))]
    print(f"params {max(pr):13.4f}  {max(pu):15.4f}   (max over leaves)")
    print("\nIf ref-vs-ref@1ulp on theta/dx is of the same order as "
          "kernel-vs-ref, the 0.2 test tolerance is a cancellation floor, "
          "not a kernel-error allowance.")


if __name__ == "__main__":
    main()
