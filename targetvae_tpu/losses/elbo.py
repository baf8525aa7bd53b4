"""The TARGET-VAE ELBO: one implementation of the three inference modes.

The reference duplicates this logic across four training scripts
(train_mnist.py:26-294, train_particles.py:28-343, train_dsprites.py,
train_galaxy.py); here it is a single pure function over (params, batch, key).

Modes (SURVEY.md section 2.5):
  A  unimodal x unimodal       — reparameterized draw from one Gaussian whose
     leading dims encode (theta, dx); closed-form KLs.
  B  attention x unimodal      — spatial attention over translations; Gumbel
     sample picks a cell; moments are attention-weighted; discrete+conditional KL.
  C  attention x attention     — joint posterior over the R x H' x W' grid
     (TARGET-VAE proper), optionally with group rotation offsets.

Everything is static-shaped and jit-resident: the attention-cell coordinate
grids and translation priors are trace-time numpy constants (the reference
rebuilds them on host every minibatch, train_mnist.py:112-121) and the
posterior math runs in float32 regardless of the conv compute dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.encoders import encoder_apply, attn_dim_for
from ..models.generator import generator_apply
from ..ops.coords import attention_grid, transform_coords
from ..ops.kl import normal_kl, guarded_moments
from ..utils.config import ModelConfig
from .likelihoods import reconstruction_log_prob

_EPS = 1e-6


def _wmean(v: jnp.ndarray, row_weights) -> jnp.ndarray:
    """Batch mean, or the weighted SUM when per-row weights are given (the
    caller owns normalization — see reconstruction_log_prob)."""
    return jnp.mean(v) if row_weights is None else jnp.dot(row_weights, v)


def _use_posterior_kernel(compute_dtype) -> bool:
    import os
    if os.environ.get("TARGETVAE_DISABLE_PALLAS"):
        return False
    return (compute_dtype == jnp.bfloat16
            and jax.default_backend() == "tpu")


def _use_pose_decoder(gcfg, compute_dtype) -> bool:
    import os
    from ..kernels.decoder_pose import pose_decoder_supported
    if os.environ.get("TARGETVAE_DISABLE_PALLAS"):
        return False
    return (compute_dtype == jnp.bfloat16
            and pose_decoder_supported(gcfg)
            and jax.default_backend() == "tpu")


def _translation_log_prior(grid: np.ndarray) -> np.ndarray:
    """log p(t) over attention cells: log-softmaxed N(0, 0.1) density
    (reference train_mnist.py:168-171). grid: (M, 2) -> (M,)."""
    std = 0.1
    lp = (-0.5 * np.log(2 * np.pi) - np.log(std)
          - 0.5 * (grid / std) ** 2).sum(axis=1)
    lp = lp - (np.max(lp) + np.log(np.sum(np.exp(lp - np.max(lp)))))
    return lp.astype(np.float32)


def sp_cell_views(enc: dict, ecfg, b: int) -> dict:
    """Flatten a skip_posterior encoder output to flat per-cell arrays plus
    the trace-time cell constants — the shared assembly of the two SP tiers
    (the GSPMD branch below and the Trainer's kernel path,
    train/loop.py::_loss_fn_sp). Cell order is the r-minor flatten of
    (H', W', R) for mode C, matching the unsharded tiers."""
    ad = attn_dim_for(ecfg)
    M = ad * ad
    grid_np = np.asarray(attention_grid(ad, ecfg.image_dim))
    p_t = _translation_log_prior(grid_np)
    if ecfg.mode == "C":
        R = ecfg.groupconv
        sig_r = np.pi / R if R >= 1 else ecfg.theta_prior
        grid_cells = jnp.asarray(np.repeat(grid_np, R, axis=0))
        log_prior = (jnp.asarray(p_t)[:, None] + enc["p_r"]).reshape(-1)
        offs_cells = jnp.tile(enc["offsets"], M)
    else:
        R = 1
        sig_r = ecfg.theta_prior
        grid_cells = jnp.asarray(grid_np)
        log_prior = jnp.asarray(p_t)
        offs_cells = jnp.zeros((M,), jnp.float32)
    cells = M * R
    return {
        "cells": cells, "sig_r": float(sig_r),
        "attn": enc["attn"].reshape(b, cells).astype(jnp.float32),
        "th_mu": enc["theta_mu"].reshape(b, cells).astype(jnp.float32),
        "th_ls": enc["theta_logstd"].reshape(b, cells).astype(jnp.float32),
        "z_mu": enc["z_mu"].reshape(b, cells, ecfg.z_dim).astype(jnp.float32),
        "z_ls": enc["z_logstd"].reshape(b, cells,
                                        ecfg.z_dim).astype(jnp.float32),
        "log_prior": log_prior, "grid_cells": grid_cells,
        "offs_cells": offs_cells,
    }


def reconstruct_log_prob(params: dict, cfg: ModelConfig, x_coord: jnp.ndarray,
                         y: jnp.ndarray, theta: jnp.ndarray, dx: jnp.ndarray,
                         z: jnp.ndarray,
                         ctf: Optional[jnp.ndarray] = None,
                         compute_dtype: Optional[jnp.dtype] = None,
                         allow_kernels: bool = True,
                         row_weights: Optional[jnp.ndarray] = None,
                         ) -> jnp.ndarray:
    """Decode (theta, dx, z) and score y under the configured likelihood —
    the shared reconstruction tail of every ELBO mode (reference
    train_mnist.py:286-294 / train_particles.py:284-341)."""
    gcfg, lcfg, ecfg = cfg.generator, cfg.likelihood, cfg.encoder
    btw = 2.0 / (ecfg.image_dim - 1)
    if allow_kernels and _use_pose_decoder(gcfg, compute_dtype):
        # pose-aware fused kernel: exploits the regular pixel grid to make the
        # Fourier phase separable (kernels/decoder_pose.py) — the direct
        # n^2 * F cos is the single most expensive op of the training step
        from ..kernels.decoder_pose import fused_pose_decoder
        y_hat = fused_pose_decoder(theta, dx, z, params["generator"], gcfg,
                                   ecfg.image_dim)
    else:
        x_t = transform_coords(x_coord, dx, theta)
        y_hat = generator_apply(params["generator"], gcfg, x_t,
                                z if gcfg.z_dim > 0 else None,
                                compute_dtype=compute_dtype)
    # big per-image CTF kernels go through the DFT-matmul path on the TPU
    # bf16 route (likelihoods.ctf_apply_dft): XLA's depthwise conv runs at
    # 0.44 TF/s there; the exact conv is kept for f32/CPU
    use_dft = (ctf is not None and ctf.shape[-1] >= 32
               and compute_dtype == jnp.bfloat16
               and jax.default_backend() == "tpu")
    return reconstruction_log_prob(
        y_hat, y, lcfg.kind, fit_noise=lcfg.fit_noise, ctf=ctf,
        dx=dx, mask_radius=lcfg.mask_radius, btw_pixels_space=btw,
        ctf_dft=use_dft, row_weights=row_weights)


def compute_elbo(params: dict, cfg: ModelConfig, x_coord: jnp.ndarray,
                 y: jnp.ndarray, key: jax.Array,
                 ctf: Optional[jnp.ndarray] = None,
                 compute_dtype: Optional[jnp.dtype] = None,
                 allow_kernels: bool = True,
                 sp=None,
                 row_weights: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns scalar (elbo, log_p_x_g_z, kl_div), batch means.

    row_weights: optional (B,) weights turning every batch mean into a
    weighted SUM (caller-normalized) — used by the Trainer's zero-weight
    ragged-tail padding so tail batches stay on the mesh kernel path.

    x_coord: (N, 2) base pixel coordinates; y: (B, H, W, C) images.

    Note: on the bf16/TPU fast path the reconstruction uses the pose-aware
    decoder kernel, which derives coordinates from (theta, dx) and the
    STANDARD image grid (ops/coords.image_grid) — x_coord must be that grid
    (it always is for the CLIs/Trainer). Pass compute_dtype=None to decode
    arbitrary x_coord.

    allow_kernels=False forces the pure-XLA paths: pallas_call custom calls
    cannot be partitioned by GSPMD. Under a mesh the Trainer instead calls
    this per-shard inside shard_map with allow_kernels=True (batch split
    over both mesh axes; --sp runs its own kernel shard_map,
    train/loop.py::_loss_fn_sp), falling back to the sharded XLA tiers only
    for ragged tail batches (and the GSPMD --sp branch below when the
    kernels cannot engage).

    sp: None, or a (mesh, axis_name) pair enabling the grid-sharded
    posterior (sequence parallelism over the joint R*H'*W' cell axis,
    parallel/grid_softmax.make_joint_posterior) for modes B and C. The
    Gumbel noise is drawn once for the full grid, so an SP run samples
    identically to the unsharded run.
    """
    ecfg, gcfg, lcfg = cfg.encoder, cfg.generator, cfg.likelihood
    b = y.shape[0]
    btw = 2.0 / (ecfg.image_dim - 1)
    k_enc, k_z, k_theta = jax.random.split(key, 3)

    use_sp = sp is not None and ecfg.mode in ("B", "C")
    enc = encoder_apply(params["encoder"], ecfg, y,
                        None if use_sp else k_enc,
                        compute_dtype=compute_dtype,
                        allow_kernels=allow_kernels,
                        skip_posterior=use_sp)

    if use_sp:
        from ..parallel.grid_softmax import make_joint_posterior
        mesh, axis = sp
        cv = sp_cell_views(enc, ecfg, b)
        cells, sig_r = cv["cells"], cv["sig_r"]
        attn_flat, th_mu, th_ls = cv["attn"], cv["th_mu"], cv["th_ls"]
        z_mu, z_ls = cv["z_mu"], cv["z_ls"]
        log_prior, grid_cells, offs_cells = (
            cv["log_prior"], cv["grid_cells"], cv["offs_cells"])
        nshard = dict(mesh.shape)[axis]
        # same key+shape as the unsharded encoder's gumbel_softmax draw
        noise = jax.random.gumbel(k_enc, (b, cells), jnp.float32)
        pad = (-cells) % nshard
        if pad:
            # shard_map needs even cell shards: pad with -1e30 logits. The
            # pads get exactly-zero posterior/sample mass (exp underflows),
            # the NaN guards neutralize their moments, and every psum'd
            # term they contribute is 0 * finite = 0.
            neg = jnp.full((b, pad), -1e30, jnp.float32)
            attn_flat = jnp.concatenate([attn_flat, neg], axis=1)
            noise = jnp.concatenate([noise, jnp.zeros((b, pad))], axis=1)
            th_mu = jnp.concatenate([th_mu, jnp.zeros((b, pad))], axis=1)
            th_ls = jnp.concatenate([th_ls, jnp.zeros((b, pad))], axis=1)
            zpad = jnp.zeros((b, pad, ecfg.z_dim))
            z_mu = jnp.concatenate([z_mu, zpad], axis=1)
            z_ls = jnp.concatenate([z_ls, zpad], axis=1)
            log_prior = jnp.concatenate(
                [log_prior, jnp.full((pad,), -1e30, jnp.float32)])
            grid_cells = jnp.concatenate(
                [grid_cells, jnp.zeros((pad, 2), grid_cells.dtype)])
            offs_cells = jnp.concatenate([offs_cells, jnp.zeros((pad,))])
        block = make_joint_posterior(mesh, axis, sig_r=float(sig_r),
                                     eps=_EPS)
        z_mu_e, z_std_e, th_mu_e, th_std_e, dx, kl = block(
            attn_flat, noise, th_mu, th_ls, z_mu, z_ls,
            log_prior, grid_cells, offs_cells)
        z = z_std_e * jax.random.normal(k_z, (b, ecfg.z_dim)) + z_mu_e
        theta = th_std_e * jax.random.normal(k_theta, (b,)) + th_mu_e
        kl_div = _wmean(kl, row_weights)

    elif ecfg.mode == "A":
        z_mu, z_logstd = enc["z_mu"], enc["z_logstd"]
        z_std = jnp.exp(z_logstd)
        r = jax.random.normal(k_z, z_mu.shape, dtype=z_mu.dtype)
        zfull = z_std * r + z_mu

        theta = zfull[:, 0]
        sigma = ecfg.theta_prior
        kl_theta = (-z_logstd[:, 0] + np.log(sigma)
                    + (z_std[:, 0] ** 2 + z_mu[:, 0] ** 2) / (2 * sigma ** 2) - 0.5)
        dx = zfull[:, 1:3] * 0.1  # dx_scale (reference train_mnist.py:62-66)
        z = zfull[:, 3:]
        # unit-normal KL over translations AND content (reference :82-83)
        rest_logstd, rest_std, rest_mu = z_logstd[:, 1:], z_std[:, 1:], z_mu[:, 1:]
        z_kl = -rest_logstd + 0.5 * rest_std ** 2 + 0.5 * rest_mu ** 2 - 0.5
        kl_div = _wmean(kl_theta + jnp.sum(z_kl, axis=1), row_weights)


    elif (ecfg.mode == "B" and allow_kernels
          and _use_posterior_kernel(compute_dtype)):
        # mode B is the R=1 special case of the joint posterior: same fused
        # softmax+Gumbel+moments+KL kernel with a single rotation cell,
        # offsets 0 and conditional prior std = theta_prior
        from ..kernels.posterior import fused_posterior
        attn = enc["attn"]                                        # (B, H', W')
        ad = attn.shape[1]
        M = ad * ad
        grid_np = np.asarray(attention_grid(ad, ecfg.image_dim))
        p_t = jnp.asarray(_translation_log_prior(grid_np)).reshape(1, M)
        post = fused_posterior(
            k_enc, attn.reshape(b, 1, M),
            enc["theta_mu"].reshape(b, 1, M),
            enc["theta_logstd"].reshape(b, 1, M),
            jnp.transpose(enc["z_mu"].reshape(b, M, ecfg.z_dim),
                          (0, 2, 1)).reshape(b, ecfg.z_dim, 1, M),
            jnp.transpose(enc["z_logstd"].reshape(b, M, ecfg.z_dim),
                          (0, 2, 1)).reshape(b, ecfg.z_dim, 1, M),
            p_t, jnp.asarray(grid_np), jnp.zeros((1,), jnp.float32),
            ecfg.theta_prior)
        z = (post["z_std_e"] * jax.random.normal(k_z, (b, ecfg.z_dim))
             + post["z_mu_e"])
        theta = (post["theta_std_e"] * jax.random.normal(k_theta, (b,))
                 + post["theta_mu_e"])
        dx = post["dx"]
        kl_div = _wmean(post["kl"], row_weights)

    elif ecfg.mode == "B":
        attn = enc["attn"].astype(jnp.float32)                    # (B, H', W')
        a_s = enc["a_sampled"].reshape(b, -1)                     # (B, M)
        ad = attn.shape[1]
        grid = jnp.asarray(attention_grid(ad, ecfg.image_dim))    # (M, 2)

        z_mu = enc["z_mu"].reshape(b, -1, ecfg.z_dim)             # (B, M, zd)
        z_std = jnp.exp(enc["z_logstd"]).reshape(b, -1, ecfg.z_dim) + _EPS
        z_mu_e = jnp.einsum("bmz,bm->bz", z_mu, a_s)
        z_std_e = jnp.einsum("bmz,bm->bz", z_std, a_s)
        z = z_std_e * jax.random.normal(k_z, z_mu_e.shape) + z_mu_e

        dx = jnp.einsum("mj,bm->bj", grid, a_s)

        th_mu = enc["theta_mu"].reshape(b, -1)
        th_std = jnp.exp(enc["theta_logstd"]).reshape(b, -1) + _EPS
        th_mu_e = jnp.einsum("bm,bm->b", th_mu, a_s)
        th_std_e = jnp.einsum("bm,bm->b", th_std, a_s)
        theta = th_std_e * jax.random.normal(k_theta, (b,)) + th_mu_e


        q_t = jax.nn.log_softmax(attn.reshape(b, -1), axis=1)     # (B, M)
        zg_mu, zg_std = guarded_moments(q_t[..., None], z_mu, z_std)
        tg_mu, tg_std = guarded_moments(q_t, th_mu, th_std)

        p_t = jnp.asarray(_translation_log_prior(np.asarray(attention_grid(ad, ecfg.image_dim))))
        val1 = jnp.sum(jnp.exp(q_t) * (q_t - p_t), axis=1)
        kl_z = jnp.sum(normal_kl(zg_mu, zg_std, 0.0, 1.0), axis=-1)
        kl_th = normal_kl(tg_mu, tg_std, 0.0, ecfg.theta_prior)
        val2 = jnp.sum(jnp.exp(q_t) * (kl_th + kl_z), axis=1)
        kl_div = _wmean(val1 + val2, row_weights)

    elif (ecfg.mode == "C" and allow_kernels
          and _use_posterior_kernel(compute_dtype)):
        # fused posterior kernel: softmax + Gumbel + moments + KL in one pass
        from ..kernels.posterior import fused_posterior
        R = ecfg.groupconv
        ad = attn_dim_for(ecfg)
        M = ad * ad
        sig_r = np.pi / R if R >= 1 else ecfg.theta_prior
        p_t = _translation_log_prior(np.asarray(attention_grid(ad, ecfg.image_dim)))
        p_tr = jax.nn.log_softmax(
            (jnp.asarray(p_t)[:, None] + enc["p_r"]).reshape(-1))
        p_tr = p_tr.reshape(M, R).T                               # (R, M)
        to_rm = lambda v: jnp.transpose(v, (0, 3, 1, 2)).reshape(b, R, M)
        z_rm = lambda v: jnp.transpose(v, (0, 4, 3, 1, 2)).reshape(
            b, ecfg.z_dim, R, M)
        post = fused_posterior(
            k_enc, to_rm(enc["attn"]), to_rm(enc["theta_mu"]),
            to_rm(enc["theta_logstd"]), z_rm(enc["z_mu"]),
            z_rm(enc["z_logstd"]),
            p_tr, jnp.asarray(attention_grid(ad, ecfg.image_dim)),
            enc["offsets"], sig_r)
        z = (post["z_std_e"] * jax.random.normal(k_z, (b, ecfg.z_dim))
             + post["z_mu_e"])
        theta = (post["theta_std_e"] * jax.random.normal(k_theta, (b,))
                 + post["theta_mu_e"])
        dx = post["dx"]
        kl_div = _wmean(post["kl"], row_weights)

    else:  # mode C
        R = ecfg.groupconv
        q = enc["q"].astype(jnp.float32)                          # (B,H',W',R)
        a_s4 = enc["a_sampled"]                                   # (B,H',W',R)
        a_s = a_s4.reshape(b, -1)                                 # over H'W'R cells
        a_locs = jnp.sum(a_s4, axis=3).reshape(b, -1)             # (B, M)
        ad = q.shape[1]
        grid = jnp.asarray(attention_grid(ad, ecfg.image_dim))    # (M, 2)

        z_mu = enc["z_mu"].reshape(b, -1, ecfg.z_dim)             # (B, H'W'R, zd)
        z_std = jnp.exp(enc["z_logstd"]).reshape(b, -1, ecfg.z_dim) + _EPS
        z_mu_e = jnp.einsum("bmz,bm->bz", z_mu, a_s)
        z_std_e = jnp.einsum("bmz,bm->bz", z_std, a_s)
        z = z_std_e * jax.random.normal(k_z, z_mu_e.shape) + z_mu_e

        dx = jnp.einsum("mj,bm->bj", grid, a_locs)

        th_mu = enc["theta_mu"].reshape(b, -1)                    # offsets included
        th_std = jnp.exp(enc["theta_logstd"]).reshape(b, -1) + _EPS
        th_mu_e = jnp.einsum("bm,bm->b", th_mu, a_s)
        th_std_e = jnp.einsum("bm,bm->b", th_std, a_s)
        theta = th_std_e * jax.random.normal(k_theta, (b,)) + th_mu_e


        # joint prior p(t, r) = log_softmax(p_t + p_r) over all cells
        # (layout: (H, W, R) flattened; p_r varies along the R-minor axis)
        p_t = _translation_log_prior(np.asarray(attention_grid(ad, ecfg.image_dim)))
        p_tr_flat = (jnp.asarray(p_t)[:, None] + enc["p_r"]).reshape(-1)
        p_tr_flat = jax.nn.log_softmax(p_tr_flat)
        qf = q.reshape(b, -1)
        val1 = jnp.sum(jnp.exp(qf) * (qf - p_tr_flat), axis=1)

        zq_mu, zq_std = guarded_moments(qf[..., None], z_mu, z_std)
        tq_mu, tq_std = guarded_moments(qf, th_mu, th_std)
        kl_z = jnp.sum(normal_kl(zq_mu, zq_std, 0.0, 1.0), axis=-1)  # (B, HWR)

        sig_r = np.pi / R if R >= 1 else ecfg.theta_prior
        offs = enc["offsets"]                                     # (R,)
        offs_cells = jnp.tile(offs, ad * ad)                      # (HWR,) R-minor
        kl_th = normal_kl(tq_mu, tq_std, offs_cells, sig_r)
        val2 = jnp.sum(jnp.exp(qf) * (kl_th + kl_z), axis=1)
        kl_div = _wmean(val1 + val2, row_weights)

    # ---- reconstruction ----
    log_p = reconstruct_log_prob(params, cfg, x_coord, y, theta, dx, z,
                                 ctf=ctf, compute_dtype=compute_dtype,
                                 allow_kernels=allow_kernels,
                                 row_weights=row_weights)
    elbo = log_p - kl_div
    return elbo, log_p, kl_div
