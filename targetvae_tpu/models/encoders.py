"""The three inference networks (encoders) of TARGET-VAE.

Reference: src/models.py:229-403. Mode A is a plain MLP producing a unimodal
Gaussian posterior; mode B adds spatial attention over translations; mode C —
the TARGET-VAE encoder — lifts the image onto the rotation group with a group
conv and produces a joint posterior over the translation x rotation grid.

TPU-first layout: activations are channels-last with the 128-kernel axis
innermost, (B, H', W', R, K), so every 1x1x1 "conv" head is a single matmul
whose contraction rides the 128-lane MXU axis; the three heads are fused into
one matmul by concatenating their weights at apply time. The joint posterior
(log-softmax over R*H'*W') and the Gumbel sample are computed in float32.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.groupconv import conv2d, lifted_conv2d
from ..ops.gumbel import gumbel_softmax
from ..ops.rotate import rotate_filter_bank
from ..utils.config import EncoderConfig
from ..utils.initializers import conv2d_init, groupconv_init, linear_init


def _encoder_kernel_vmem_ok(cfg: EncoderConfig, tile_rows: int = 13) -> bool:
    """Rough per-program VMEM estimate; fall back to XLA when the fused
    kernel's working set wouldn't fit (e.g. dsprites k=64 -> 4096-wide
    patches)."""
    k2 = cfg.kernels_size ** 2 * cfg.in_channels
    rk = cfg.groupconv * cfg.kernels_num
    wp = attn_dim_for(cfg)
    rows = tile_rows * wp
    est = (k2 * rk * 2            # wc bf16
           + rows * k2 * 2        # P tile bf16 (built in XLA)
           + rows * rk * 8        # pre1/h1 f32 (fwd)
           + rows * rk * 2        # h1 bf16 residual block
           + k2 * rk * 4          # bwd dwc accumulator
           + rows * rk * 4)       # bwd dpre1
    # calibrated against the largest config known to compile (P8, k=28)
    return est < 13 * 1024 * 1024


def _use_encoder_kernel(cfg: EncoderConfig, compute_dtype) -> bool:
    """Gate for the single-kernel patch-im2col encoder (_mode_c_kernel).

    Off by default since round 3: the 1-D-conv lift tier (_mode_c_xla_matmul)
    measured FASTER at the only shapes that fit this kernel's VMEM budget
    (flagship 50x50/k=28/P8, batch 100: 17.96 ms/step vs 19.15 interleaved
    A/B, 3 rounds each — the implicit-GEMM conv never materializes the
    238 MB patch matrix whose build costs ~2 ms of HBM relayout copies).
    TARGETVAE_ENCODER_TIER=patch re-enables it (the kernel stays
    parity-tested in interpret mode)."""
    if os.environ.get("TARGETVAE_DISABLE_PALLAS"):
        return False
    return (os.environ.get("TARGETVAE_ENCODER_TIER") == "patch"
            and compute_dtype == jnp.bfloat16 and cfg.mode == "C"
            and jax.default_backend() == "tpu"
            and _encoder_kernel_vmem_ok(cfg))


def _act(name: str):
    if name == "tanh":
        return jnp.tanh
    return lambda x: jax.nn.leaky_relu(x, 0.01)


def group_offsets(R: int) -> np.ndarray:
    """Group rotation offsets for P4/P8/P16, wrapped to (-pi, pi] with +pi kept.

    Matches the explicit tables at reference src/models.py:362-366.
    """
    ang = 2.0 * np.pi * np.arange(R) / R
    ang = np.where(ang > np.pi + 1e-9, ang - 2.0 * np.pi, ang)
    return ang.astype(np.float32)


def rotation_log_prior(cfg: EncoderConfig, R: int) -> np.ndarray:
    """log p(r), shape (R,). Reference src/models.py:368-379."""
    if cfg.rot_refinement:
        offs = group_offsets(R)
        if cfg.normal_prior_over_r:
            sig = cfg.theta_prior
            return (-0.5 * np.log(2 * np.pi) - np.log(sig)
                    - 0.5 * (offs / sig) ** 2).astype(np.float32)
        # Uniform(-2pi, 2pi).log_prob
        return np.full(R, -np.log(4 * np.pi), dtype=np.float32)
    return np.full(R, -np.log(R), dtype=np.float32)


def attn_dim_for(cfg: EncoderConfig) -> int:
    """Spatial size of the attention map."""
    n = cfg.image_dim
    if cfg.mode == "C":
        return n + 2 * cfg.padding - cfg.kernels_size + 1
    # mode B: kernel = n, padding = n//2 (src/models.py:283, :290)
    return n + 2 * (n // 2) - n + 1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def encoder_init(key: jax.Array, cfg: EncoderConfig) -> dict:
    if cfg.mode == "C" and cfg.groupconv not in (4, 8, 16):
        raise ValueError(
            "attention rotation inference (t_inf=attention, r_inf=attention*) "
            f"requires groupconv in (4, 8, 16), got {cfg.groupconv}")
    if cfg.mode == "B" and cfg.groupconv not in (0, 4, 8, 16):
        raise ValueError(f"groupconv must be 0, 4, 8 or 16, got {cfg.groupconv}")
    keys = jax.random.split(key, 8)
    zd = cfg.z_dim
    kn = cfg.kernels_num

    if cfg.mode == "A":
        # MLP on the flattened image -> 2*(z_dim+3) (src/models.py:229-260)
        latent = zd + 3
        n = cfg.image_dim * cfg.image_dim * cfg.in_channels
        hidden = kn  # reference passes encoder_kernel_number as hidden_dim
        layers = [linear_init(keys[0], n, hidden)]
        for i in range(1, cfg.num_layers):
            layers.append(linear_init(keys[i], hidden, hidden))
        layers.append(linear_init(keys[cfg.num_layers], hidden, 2 * latent))
        return {"layers": layers}

    if cfg.mode == "B":
        n = cfg.image_dim
        p: dict = {}
        if cfg.groupconv == 0:
            p["conv1"] = conv2d_init(keys[0], cfg.in_channels, kn, n)
        else:
            p["conv1"] = groupconv_init(keys[0], cfg.in_channels, kn, n)
            p["fc_r"] = linear_init(keys[1], cfg.groupconv, 1)
        p["conv2"] = linear_init(keys[2], kn, kn)
        p["conv_a"] = linear_init(keys[3], kn, 1)
        p["conv_r"] = linear_init(keys[4], kn, 2)
        p["conv_z"] = linear_init(keys[5], kn, 2 * zd)
        return p

    # mode C
    p = {
        "conv1": groupconv_init(keys[0], cfg.in_channels, kn, cfg.kernels_size),
        "conv2": linear_init(keys[1], kn, kn),
        "conv_a": linear_init(keys[2], kn, 1),
        "conv_r": linear_init(keys[3], kn, 2),
        "conv_z": linear_init(keys[4], kn, 2 * zd),
    }
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _mode_c_matrices(params: dict, cfg: EncoderConfig):
    """Rotated conv matmul matrix, tiled bias, fused head weights."""
    R, K, k = cfg.groupconv, cfg.kernels_num, cfg.kernels_size
    w1 = params["conv1"]["w"]                       # (K, C, 1, k, k)
    rot = rotate_filter_bank(w1, R)                 # (R, K, C, 1, k, k)
    # channel-major rows (c*k*k + di*k + dj) matching build_patches columns
    wc = jnp.transpose(rot, (2, 3, 4, 5, 0, 1)).reshape(-1, R * K)
    bc_vec = jnp.tile(params["conv1"]["b"], R)      # r-major: index r*K+o
    wh = jnp.concatenate([params["conv_a"]["w"], params["conv_r"]["w"],
                          params["conv_z"]["w"]], axis=1)
    bh = jnp.concatenate([params["conv_a"]["b"], params["conv_r"]["b"],
                          params["conv_z"]["b"]])
    return wc, bc_vec, wh, bh


def _split_heads(out, b, hp, R, zd):
    D = 3 + 2 * zd
    out = out.reshape(b, hp, hp, R, D)              # (B, H', W', R, D)
    return (out[..., 0], out[..., 1], out[..., 2], out[..., 3:3 + zd],
            out[..., 3 + zd:])


def _mode_c_kernel(params: dict, cfg: EncoderConfig, y: jnp.ndarray):
    """Mode-C forward through the fused Pallas encoder kernel."""
    from ..kernels.lifted_encoder import fused_lifted_encoder

    R, K, k, pad = (cfg.groupconv, cfg.kernels_num, cfg.kernels_size,
                    cfg.padding)
    hp = attn_dim_for(cfg)
    b = y.shape[0]
    wc, bc_vec, wh, bh = _mode_c_matrices(params, cfg)
    xp = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = fused_lifted_encoder(
        xp, wc, bc_vec, params["conv2"]["w"], params["conv2"]["b"], wh, bh,
        k=k, wp=hp, hp=hp, R=R, K=K, act_kind=cfg.activation)
    return _split_heads(out[:, :hp * hp, :], b, hp, R, cfg.z_dim)


def _lift_batch_pad(hp: int, cols: int) -> int:
    """Zero batch rows to append to the 1-D lift conv so N = hp*(cols+p)
    admits an 8-aligned tile divisor in [256, 640] (kernels/mix_heads.py::
    _tile_for): Mosaic's (8, 128) HBM tiling makes the kernel's blocked view
    a bitcast only for 8-aligned tiles; a misaligned tile re-tiles the
    1.1 GB h1 AND dpre1 (2 x 2 ms/step at EMPIAR scale, hlo_stats). EMPIAR:
    cols 3950 -> 3952, N = 312208 = 494 x 632; dsprites: 3250 -> 3256,
    N = 211640 = 407 x 520; galaxy (N = 51200 = 100 x 512) needs none."""
    for p in range(64):
        n = hp * (cols + p)
        if any(n % t == 0 for t in range(256, 641) if t % 8 == 0):
            return p
    return 0


def _lift_wgrad(lhs: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Weight-grad of the 1-D lift conv, phrased to consume BOTH operands in
    their native layouts: drhs[o, ci, dw] = sum_{n, w} lhs[n, ci, w+dw] *
    g[w, n, o]. The contraction runs over (batch n, output position w) with
    the k filter taps as the output spatial axis; ConvDimensionNumbers maps
    the physical NCW lhs and the WNC bf16 cotangent straight into that conv
    with a f32 accumulator.

    MEASURED (2026-08-21, v5e): XLA's own rhs-transpose rule is equally
    fast — standalone 15.68 (auto) vs 15.64 ms (this) at the EMPIAR shape,
    167 TF/s both (tools/bench_lift_wgrad.py), and the full particles-ctf
    step is 64.5 vs 64.7 ms (TARGETVAE_LIFT_WGRAD=auto A/B). The round-3
    ROADMAP hypothesis of ~5 ms of cotangent-transpose glue in the auto
    path was WRONG. Kept anyway: it pins the wgrad's layout contract
    explicitly (immune to transpose-rule regressions), accumulates in f32
    where the auto path emits bf16, and costs nothing."""
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(1, 0, 2),     # lhs (n, ci, w): batch=ci, feature=n
        rhs_spec=(2, 1, 0),     # g (w, n, o): out-feature=o, in-feature=n
        out_spec=(1, 0, 2))     # drhs (o, ci, dw)
    return jax.lax.conv_general_dilated(
        lhs, g.astype(lhs.dtype), (1,), "VALID", dimension_numbers=dn,
        preferred_element_type=jnp.float32)


@jax.custom_vjp
def _lift_conv_op_p(lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """The 1-D lift conv with a hand-written weight-grad (see _lift_wgrad).
    lhs (n, Ck, w) bf16 NCW; rhs (RK, Ck, k) bf16 OIW; out (W', n, RK) WNC.
    The lhs cotangent is structurally zero — callers go through
    _lift_conv_op, which cuts the lhs tangent path with stop_gradient."""
    return jax.lax.conv_general_dilated(
        lhs, rhs, (1,), "VALID", dimension_numbers=("NCW", "OIW", "WNC"))


def _lift_conv_op_fwd(lhs, rhs):
    # the rhs cotangent must match rhs's dtype; only lhs is saved, so
    # require the dtypes to agree (they always do: bf16 on the TPU tiers,
    # f32 in the parity tests). A zero-size dtype-witness residual instead
    # broke GSPMD sharding inference inside the shard_map loss.
    assert lhs.dtype == rhs.dtype, (lhs.dtype, rhs.dtype)
    return _lift_conv_op_p(lhs, rhs), lhs


def _lift_conv_op_bwd(lhs, g):
    return jnp.zeros_like(lhs), _lift_wgrad(lhs, g).astype(lhs.dtype)


_lift_conv_op_p.defvjp(_lift_conv_op_fwd, _lift_conv_op_bwd)


def _lift_conv_op(lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Lift conv with the zero-lhs-cotangent contract enforced structurally:
    stop_gradient(lhs) here makes the custom VJP's zero lhs cotangent the
    TRUE gradient for every caller, not an assumption about call sites
    (images are data in this model family). Note the custom_vjp also makes
    this op reverse-mode only: jax.jvp/jacfwd through the encoder's big-k
    tier raises — use jax.grad (or vjp-of-vjp for HVPs)."""
    return _lift_conv_op_p(jax.lax.stop_gradient(lhs), rhs)


def _lift_conv1d(y: jnp.ndarray, wc: jnp.ndarray, *, C: int, k: int,
                 pad: int, hp: int, pad_batch: bool):
    """The 2-D lift lowered as a 1-D conv over image rows (the big-k tier).

    The dj window axis is folded into channels (batch = B*W' columns,
    C_in = C*k, width = rows). XLA's implicit-GEMM lowering of THIS conv
    runs at ~137 TF/s end to end (2.62 TFLOP in 19 ms at the cryo-EM scale)
    where its direct 2-D lowering of image-sized kernels measures
    25-42 TF/s; materializing the full (M, C*k*k) im2col patch matrix
    instead costs 43 ms of 128-byte strided HBM writes before the matmul
    even starts. Grads vs the explicit-patch formulation are bitwise
    identical.

    wc: (C*k*k, RK) matmul matrix with channel-major rows (c*k*k + di*k + dj).
    Returns (pre1_t bf16 (H', B*W' + padc, RK), cols, padc) — output order
    WNC = (H', B*W', RK) matches the conv's NATIVE layout ({2,0,1} over the
    NWC view), so a row-major 2-D view of it is a bitcast; callers reorder
    only their (R*D)-channel head output (~18x smaller than h1)."""
    b = y.shape[0]
    RK = wc.shape[1]
    xp = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    n2 = xp.shape[1]
    # q[b, i, j, c, dj] = xp[b, i, j+dj, c]
    q = jnp.stack([xp[:, :, dj:dj + hp, :] for dj in range(k)],
                  axis=-1).astype(jnp.bfloat16)          # (B, n2, W', C, k)
    lhs = jnp.transpose(q, (0, 2, 3, 4, 1)).reshape(b * hp, C * k, n2)
    lhs = jax.lax.stop_gradient(lhs)                     # images are data
    cols = b * hp
    padc = _lift_batch_pad(hp, cols) if pad_batch else 0
    if padc:
        lhs = jnp.pad(lhs, ((0, padc), (0, 0), (0, 0)))
    # wc rows are (c*k*k + di*k + dj); conv wants (RK, (c,dj), di)
    rhs = jnp.transpose(
        wc.astype(jnp.bfloat16).reshape(C, k, k, RK),
        (3, 0, 2, 1)).reshape(RK, C * k, k)
    if os.environ.get("TARGETVAE_LIFT_WGRAD") == "auto":
        # A/B escape hatch: XLA's autodiff wgrad (generic transpose rule)
        pre1_t = jax.lax.conv_general_dilated(
            lhs, rhs, (1,), "VALID",
            dimension_numbers=("NCW", "OIW", "WNC"))     # bf16 (H', cols+p, RK)
    else:
        pre1_t = _lift_conv_op(lhs, rhs)
    return pre1_t, cols, padc


def _mode_c_xla_matmul(params: dict, cfg: EncoderConfig, y: jnp.ndarray,
                       allow_kernels: bool = True):
    """Mode-C TPU tier (the default since round 3, all kernel sizes):
    1-D-conv lift (_lift_conv1d) + fused mixing/heads. Originally the big-k
    tier (k = 64..65, cryo-EM / dsprites / galaxy, where the patch kernel's
    working set exceeds VMEM); it also beats the patch kernel at small k
    (see _use_encoder_kernel)."""
    R, K, k, pad = (cfg.groupconv, cfg.kernels_num, cfg.kernels_size,
                    cfg.padding)
    hp = attn_dim_for(cfg)
    b = y.shape[0]
    C = cfg.in_channels
    act = _act(cfg.activation)
    wc, bc_vec, wh, bh = _mode_c_matrices(params, cfg)

    use_kernel = (allow_kernels and jax.default_backend() == "tpu"
                  and not os.environ.get("TARGETVAE_DISABLE_PALLAS"))

    pre1_t, cols, padc = _lift_conv1d(y, wc, C=C, k=k, pad=pad, hp=hp,
                                      pad_batch=use_kernel)
    D = 3 + 2 * cfg.z_dim
    if use_kernel:
        # fused Pallas lift-act + mixing + heads: the raw conv output goes in
        # bf16, h1 = act(pre1 + bc) and h2 live in-kernel (recomputed in the
        # bwd — no residuals), and the backward emits the bf16 conv
        # cotangent dpre1 directly (kernels/mix_heads.py)
        from ..kernels.mix_heads import fused_lift_act_mix_heads
        out = fused_lift_act_mix_heads(
            pre1_t.reshape(hp * (cols + padc), R * K), bc_vec,
            params["conv2"]["w"], params["conv2"]["b"],
            wh, bh, R=R, K=K, act_kind=cfg.activation)
        out = out.reshape(hp, cols + padc, R, D)
        if padc:
            out = out[:, :cols]                          # drop pad batch rows
        out = out.reshape(hp, b, hp, R, D)               # (H', B, W', R, D)
    else:
        h1 = act(pre1_t.astype(jnp.float32) + bc_vec).astype(jnp.bfloat16)
        h1 = h1.reshape(hp, b, hp, R, K)                 # (H', B, W', R, K)
        pre2 = jnp.dot(h1, params["conv2"]["w"].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        h2 = act(pre2 + params["conv2"]["b"]).astype(jnp.bfloat16)
        out = jnp.dot(h2, wh.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bh
    out = jnp.transpose(out, (1, 0, 2, 3, 4))            # -> (B, H', W', ...)
    return _split_heads(out.reshape(b, hp * hp, R, -1), b, hp, R, cfg.z_dim)


def _mode_b_fast(params: dict, cfg: EncoderConfig, y: jnp.ndarray,
                 allow_kernels: bool = True):
    """Mode-B TPU tier: 1-D-conv lift + folded rotation collapse.

    The reference mode-B encoder (src/models.py:282-304) runs one conv with
    kernel = image size (groupconv==0), or a group-conv lift followed by a
    learned rotation collapse fc_r: Linear(R, 1) then the 1x1 mixing conv.
    Both map onto mode C's machinery: the image-sized conv runs as the same
    1-D implicit-GEMM lift (direct 2-D lowering of a 50x50 kernel measured
    25-42 TF/s vs ~137-190 for the 1-D form), and — because fc_r and conv2
    are two composed LINEAR maps with only an activation before them — they
    fold into ONE rectangular (R*K, K) mixing matrix
        M[(r,k'),k] = fc_w[r] * W2[k',k],  b' = fc_b * sum_k' W2[k',k] + b2
    executed by the fused Pallas mixing/heads kernel at R=1
    (kernels/mix_heads.py, rectangular K_in). Grads w.r.t. fc_r/conv2 chain
    through the fold automatically (it is differentiable XLA ops on the
    params). Returns the five raw head tensors with NO rotation axis."""
    n, K, C = cfg.image_dim, cfg.kernels_num, cfg.in_channels
    k, pad = n, n // 2                     # src/models.py:283,:290
    hp = attn_dim_for(cfg)
    b = y.shape[0]
    zd = cfg.z_dim
    act = _act(cfg.activation)

    if cfg.groupconv == 0:
        w1 = params["conv1"]["w"]                       # (K, C, k, k)
        wc = jnp.transpose(w1, (1, 2, 3, 0)).reshape(C * k * k, K)
        bc_vec = params["conv1"]["b"]                   # (K,)
        mix_w, mix_b = params["conv2"]["w"], params["conv2"]["b"]
        R = 1
    else:
        R = cfg.groupconv
        rot = rotate_filter_bank(params["conv1"]["w"], R)  # (R,K,C,1,k,k)
        wc = jnp.transpose(rot, (2, 3, 4, 5, 0, 1)).reshape(-1, R * K)
        bc_vec = jnp.tile(params["conv1"]["b"], R)      # r-major (R*K,)
        fw = params["fc_r"]["w"][:, 0]                  # (R,)
        fb = params["fc_r"]["b"][0]
        w2 = params["conv2"]["w"]                       # (K, K)
        # rows r*K + k' match bc_vec / the lift's r-major channel order
        mix_w = jnp.einsum("r,ik->rik", fw, w2).reshape(R * K, K)
        mix_b = fb * jnp.sum(w2, axis=0) + params["conv2"]["b"]
    wh = jnp.concatenate([params["conv_a"]["w"], params["conv_r"]["w"],
                          params["conv_z"]["w"]], axis=1)
    bh = jnp.concatenate([params["conv_a"]["b"], params["conv_r"]["b"],
                          params["conv_z"]["b"]])
    D = 3 + 2 * zd

    use_kernel = (allow_kernels and jax.default_backend() == "tpu"
                  and not os.environ.get("TARGETVAE_DISABLE_PALLAS"))
    pre1_t, cols, padc = _lift_conv1d(y, wc, C=C, k=k, pad=pad, hp=hp,
                                      pad_batch=use_kernel)
    if use_kernel:
        from ..kernels.mix_heads import fused_lift_act_mix_heads
        out = fused_lift_act_mix_heads(
            pre1_t.reshape(hp * (cols + padc), R * K), bc_vec,
            mix_w, mix_b, wh, bh, R=1, K=K, act_kind=cfg.activation)
        out = out.reshape(hp, cols + padc, D)
        if padc:
            out = out[:, :cols]
    else:
        h1 = act(pre1_t.astype(jnp.float32) + bc_vec).astype(jnp.bfloat16)
        pre2 = jnp.dot(h1.reshape(hp, cols, R * K),
                       mix_w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) + mix_b
        h2 = act(pre2).astype(jnp.bfloat16)
        out = jnp.dot(h2, wh.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bh
    out = out.reshape(hp, b, hp, D)
    out = jnp.transpose(out, (1, 0, 2, 3))              # (B, H', W', D)
    return (out[..., 0], out[..., 1], out[..., 2], out[..., 3:3 + zd],
            out[..., 3 + zd:])


def _fused_heads(params: dict, h: jnp.ndarray, zd: int):
    """One matmul for conv_a/conv_r/conv_z (all 1x1 convs over the K axis)."""
    w = jnp.concatenate([params["conv_a"]["w"], params["conv_r"]["w"],
                         params["conv_z"]["w"]], axis=1)
    b = jnp.concatenate([params["conv_a"]["b"], params["conv_r"]["b"],
                         params["conv_z"]["b"]])
    out = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
    attn = out[..., 0]
    theta_mu = out[..., 1]
    theta_logstd = out[..., 2]
    z_mu = out[..., 3:3 + zd]
    z_logstd = out[..., 3 + zd:]
    return attn, theta_mu, theta_logstd, z_mu, z_logstd


def encoder_apply(params: dict, cfg: EncoderConfig, y: jnp.ndarray,
                  key: Optional[jax.Array],
                  compute_dtype: Optional[jnp.dtype] = None,
                  allow_kernels: bool = True,
                  skip_posterior: bool = False) -> dict:
    """y: (B, H, W, C) channels-last image batch. key: PRNG for the Gumbel
    sample (None disables sampling, e.g. for clustering/eval embedding).

    allow_kernels=False forces the XLA tiers — required under a pure-GSPMD
    multi-device mesh, where pallas_call custom calls cannot be partitioned;
    the XLA path shards cleanly. (The Trainer's per-shard shard_map path
    instead calls with allow_kernels=True on local batch slices.)

    skip_posterior=True returns the raw heads (attn WITH the rotation prior
    added, theta/z moments, offsets) but skips the joint log-softmax — for
    callers that normalize/sample externally, e.g. the grid-sharded SP
    posterior (parallel/grid_softmax.py).
    """
    act = _act(cfg.activation)
    zd = cfg.z_dim
    b = y.shape[0]

    if cfg.mode == "A":
        h = y.reshape(b, -1)
        layers = params["layers"]
        h = act(jnp.dot(h, layers[0]["w"], preferred_element_type=jnp.float32)
                + layers[0]["b"])
        for layer in layers[1:-1]:
            pre = jnp.dot(h, layer["w"],
                          preferred_element_type=jnp.float32) + layer["b"]
            # ResidLinear option (src/models.py:242-247): act(Wx + x)
            h = act(pre + h) if cfg.resid else act(pre)
        out = jnp.dot(h, layers[-1]["w"],
                      preferred_element_type=jnp.float32) + layers[-1]["b"]
        latent = zd + 3
        return {"z_mu": out[:, :latent], "z_logstd": out[:, latent:]}

    if cfg.mode == "B":
        n = cfg.image_dim
        if (compute_dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
                and not os.environ.get("TARGETVAE_DISABLE_PALLAS")):
            # fast tier: 1-D-conv lift + folded fc_r/mixing/heads kernel
            attn, theta_mu, theta_logstd, z_mu, z_logstd = _mode_b_fast(
                params, cfg, y, allow_kernels=allow_kernels)
        else:
            if cfg.groupconv == 0:
                x = act(conv2d(y, params["conv1"]["w"], params["conv1"]["b"],
                               padding=n // 2, compute_dtype=compute_dtype))
            else:
                lift = act(lifted_conv2d(y, params["conv1"]["w"],
                                         params["conv1"]["b"],
                                         R=cfg.groupconv, padding=n // 2,
                                         compute_dtype=compute_dtype))
                # learned rotation collapse fc_r: Linear(R, 1)
                # (src/models.py:292,303-304)
                x = jnp.einsum("bhwrk,r->bhwk", lift,
                               params["fc_r"]["w"][:, 0],
                               preferred_element_type=jnp.float32)
                x = x + params["fc_r"]["b"]
            h = act(jnp.dot(x, params["conv2"]["w"],
                            preferred_element_type=jnp.float32)
                    + params["conv2"]["b"])
            attn, theta_mu, theta_logstd, z_mu, z_logstd = _fused_heads(
                params, h, zd)
        out = {
            "attn": attn,  # (B, H', W') logits
            "theta_mu": theta_mu, "theta_logstd": theta_logstd,
            "z_mu": z_mu, "z_logstd": z_logstd,
        }
        if key is not None:
            a = gumbel_softmax(key, attn.reshape(b, -1).astype(jnp.float32))
            out["a_sampled"] = a.reshape(attn.shape)
        return out

    # ---- mode C: the TARGET-VAE encoder (src/models.py:354-403) ----
    R = cfg.groupconv
    if allow_kernels and _use_encoder_kernel(cfg, compute_dtype):
        attn, theta_mu, theta_logstd, z_mu, z_logstd = _mode_c_kernel(
            params, cfg, y)
    elif (compute_dtype == jnp.bfloat16
          and jax.default_backend() == "tpu"
          and not os.environ.get("TARGETVAE_DISABLE_PALLAS")):
        # big-k tier: 1-D-conv lift + fused mixing/heads kernel
        attn, theta_mu, theta_logstd, z_mu, z_logstd = _mode_c_xla_matmul(
            params, cfg, y, allow_kernels=allow_kernels)
    else:
        lift = act(lifted_conv2d(y, params["conv1"]["w"], params["conv1"]["b"],
                                 R=R, padding=cfg.padding,
                                 compute_dtype=compute_dtype))      # (B,H',W',R,K)
        h = act(jnp.dot(lift, params["conv2"]["w"],
                        preferred_element_type=jnp.float32)
                + params["conv2"]["b"])
        attn, theta_mu, theta_logstd, z_mu, z_logstd = _fused_heads(params, h,
                                                                    zd)

    p_r = jnp.asarray(rotation_log_prior(cfg, R))                   # (R,)
    attn = attn.astype(jnp.float32) + p_r                           # broadcast over R
    flat = attn.reshape(b, -1)
    q = (None if skip_posterior
         else jax.nn.log_softmax(flat, axis=-1).reshape(attn.shape))

    if cfg.rot_refinement:
        offsets = jnp.asarray(group_offsets(R))
        theta_mu = theta_mu + offsets                                # (..., R)
    else:
        offsets = jnp.zeros((R,), dtype=jnp.float32)

    out = {
        "attn": attn, "q": q, "p_r": p_r, "offsets": offsets,
        "theta_mu": theta_mu, "theta_logstd": theta_logstd,
        "z_mu": z_mu, "z_logstd": z_logstd,
    }
    if key is not None:
        a = gumbel_softmax(key, flat)
        out["a_sampled"] = a.reshape(attn.shape)
    return out
