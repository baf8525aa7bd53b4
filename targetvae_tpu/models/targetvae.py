"""TargetVAE: bundles encoder + generator + likelihood into one model object.

Pure-functional: `init` returns a params pytree, every other method is a pure
function of (params, inputs) suitable for jit/pjit. `embed` reproduces the
reference clustering embedding get_latent (clustering_mnist.py:45-164):
argmax posterior cell (no sampling), z_content = [z_mu; z_std] at the best
cell, dx = softmax-expected grid coordinate, theta = theta_mu at the best cell.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.coords import attention_grid, image_grid
from ..utils.config import ModelConfig
from .encoders import encoder_init, encoder_apply
from .generator import generator_init, generator_apply


class TargetVAE:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    def init(self, key: jax.Array) -> dict:
        kg, ke = jax.random.split(key)
        return {
            "generator": generator_init(kg, self.cfg.generator),
            "encoder": encoder_init(ke, self.cfg.encoder),
        }

    def elbo(self, params: dict, x_coord: jnp.ndarray, y: jnp.ndarray,
             key: jax.Array, ctf: Optional[jnp.ndarray] = None,
             compute_dtype=None):
        from ..losses.elbo import compute_elbo
        return compute_elbo(params, self.cfg, x_coord, y, key, ctf=ctf,
                            compute_dtype=compute_dtype)

    def decode(self, params: dict, x_coord: jnp.ndarray, z: jnp.ndarray,
               compute_dtype=None) -> jnp.ndarray:
        return generator_apply(params["generator"], self.cfg.generator,
                               x_coord, z, compute_dtype=compute_dtype)

    def base_grid(self) -> jnp.ndarray:
        return jnp.asarray(image_grid(self.cfg.encoder.image_dim))

    def embed(self, params: dict, y: jnp.ndarray, compute_dtype=None) -> dict:
        """Deterministic latent extraction for clustering/evaluation.

        y: (B, H, W, C). Returns {'z_content': (B, 2*zd), 'theta_mu': (B, 1),
        'dx': (B, 2)}.
        """
        ecfg = self.cfg.encoder
        b = y.shape[0]
        enc = encoder_apply(params["encoder"], ecfg, y, key=None,
                            compute_dtype=compute_dtype)

        if ecfg.mode == "A":
            z_mu, z_std = enc["z_mu"], jnp.exp(enc["z_logstd"])
            return {
                "z_content": jnp.concatenate([z_mu[:, 3:], z_std[:, 3:]], axis=1),
                "theta_mu": z_mu[:, 0:1],
                "dx": z_mu[:, 1:3],
            }

        attn = enc["attn"].astype(jnp.float32)
        flat = attn.reshape(b, -1)
        ind = jnp.argmax(flat, axis=1)                                  # (B,)
        ad = attn.shape[1]
        grid = jnp.asarray(attention_grid(ad, ecfg.image_dim))          # (M, 2)

        z_mu = enc["z_mu"].reshape(b, -1, ecfg.z_dim)
        z_std = jnp.exp(enc["z_logstd"]).reshape(b, -1, ecfg.z_dim)
        take = lambda v: jnp.take_along_axis(v, ind[:, None, None], axis=1)[:, 0] \
            if v.ndim == 3 else jnp.take_along_axis(v, ind[:, None], axis=1)
        z_best = take(z_mu)
        s_best = take(z_std)
        z_content = jnp.concatenate([z_best, s_best], axis=1)

        th_mu = enc["theta_mu"].reshape(b, -1)
        theta_best = take(th_mu)                                         # (B, 1)

        sm = jax.nn.softmax(flat, axis=1)
        if ecfg.mode == "C":
            # expected location: softmax marginalized over the rotation axis
            sm = sm.reshape(attn.shape).sum(axis=3).reshape(b, -1)
        dx = jnp.einsum("mj,bm->bj", grid, sm)

        return {"z_content": z_content, "theta_mu": theta_best, "dx": dx}
