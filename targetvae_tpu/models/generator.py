"""SpatialGenerator: coordinate-conditioned MLP decoder.

Reference: src/models.py:65-123. Per-pixel output logits from (coords, z):
h = W_c * embed(x) + W_z * z broadcast over pixels, then `num_layers` hidden
layers, final linear to n_out. Everything is batched matmuls over B*N rows —
pure MXU work; XLA fuses the elementwise activation and the Fourier cosine
into the matmul epilogues.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.fourier import fourier_init, fourier_apply
from ..utils.config import GeneratorConfig
from ..utils.initializers import linear_init


def _use_decoder_kernel(cfg: GeneratorConfig, compute_dtype) -> bool:
    from ..kernels.decoder_mlp import decoder_kernel_supported
    if os.environ.get("TARGETVAE_DISABLE_PALLAS"):
        return False
    return (compute_dtype == jnp.bfloat16
            and decoder_kernel_supported(cfg)
            and jax.default_backend() == "tpu")


def _act(name: str):
    if name == "tanh":
        return jnp.tanh
    return lambda x: jax.nn.leaky_relu(x, 0.01)


def generator_init(key: jax.Array, cfg: GeneratorConfig) -> dict:
    keys = jax.random.split(key, cfg.num_layers + 3)
    params: dict = {}
    in_dim = 2
    if cfg.fourier_expansion:
        params["fourier"] = fourier_init(keys[0], 2, cfg.embedding_dim)
        in_dim = cfg.embedding_dim
    params["coord_linear"] = linear_init(keys[1], in_dim, cfg.hidden_dim)
    if cfg.z_dim > 0:
        params["latent_linear"] = linear_init(keys[2], cfg.z_dim, cfg.hidden_dim,
                                              bias=False)
    hidden = []
    for i in range(1, cfg.num_layers):
        hidden.append(linear_init(keys[2 + i], cfg.hidden_dim, cfg.hidden_dim))
    params["hidden"] = hidden
    params["out"] = linear_init(keys[2 + cfg.num_layers], cfg.hidden_dim, cfg.n_out)
    return params


def generator_apply(params: dict, cfg: GeneratorConfig, x: jnp.ndarray,
                    z: Optional[jnp.ndarray],
                    compute_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """x: (B, N, 2) transformed coordinates; z: (B, z_dim) or None.

    Returns (B, N, n_out) logits (or mean/logvar pairs with fit-noise).
    """
    act = _act(cfg.activation)
    dt = compute_dtype or x.dtype

    if z is not None and _use_decoder_kernel(cfg, compute_dtype):
        # fused Pallas path: the whole Fourier+MLP pipeline in one kernel
        from ..kernels.decoder_mlp import fused_decoder_mlp
        fw = jax.lax.stop_gradient(params["fourier"]["w"])
        fb = jax.lax.stop_gradient(params["fourier"]["b"])
        hz = jnp.dot(z, params["latent_linear"]["w"],
                     preferred_element_type=jnp.float32)
        return fused_decoder_mlp(
            x, hz, fw / jnp.asarray(cfg.fourier_sigma, fw.dtype), fb,
            params["coord_linear"]["w"], params["coord_linear"]["b"],
            params["hidden"][0]["w"], params["hidden"][0]["b"],
            params["out"]["w"], params["out"]["b"],
            cfg.activation)

    if cfg.fourier_expansion:
        x = fourier_apply(params["fourier"], x, cfg.fourier_sigma)
    x = x.astype(dt)

    cw = params["coord_linear"]
    h = jnp.dot(x, cw["w"].astype(dt), preferred_element_type=jnp.float32)
    h = h + cw["b"]
    if cfg.z_dim > 0 and z is not None:
        lz = jnp.dot(z.astype(dt), params["latent_linear"]["w"].astype(dt),
                     preferred_element_type=jnp.float32)
        h = h + lz[:, None, :]

    # reference applies the activation first, then hidden layers, then out
    h = act(h)
    for layer in params["hidden"]:
        pre = jnp.dot(h.astype(dt), layer["w"].astype(dt),
                      preferred_element_type=jnp.float32) + layer["b"]
        if cfg.resid:
            h = act(pre + h)  # ResidLinear: act(Wx + x) (src/models.py:29-30)
        else:
            h = act(pre)
    ow = params["out"]
    y = jnp.dot(h.astype(dt), ow["w"].astype(dt),
                preferred_element_type=jnp.float32) + ow["b"]
    return y
