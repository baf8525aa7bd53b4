"""Jit-resident training loop.

TPU-first structure: the whole dataset lives on device (it fits — same
assumption as the reference, train_mnist.py:495-497) and an entire epoch of
minibatch steps runs inside ONE jitted lax.scan: shuffle-permutation gather,
encoder/decoder forward, ELBO, backward, Adam update, all fused by XLA with no
per-step host dispatch. The tail (partial) batch gets its own jitted step so
epoch metrics match the reference's DataLoader exactly (drop_last=False).

Metrics reproduce the reference's streaming-mean accumulators
(train_mnist.py:326-345) as a batch-size-weighted mean.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.elbo import compute_elbo
from ..models.targetvae import TargetVAE
from ..utils.config import TrainConfig
from .state import TrainState, create_train_state, make_optimizer


class Trainer:
    def __init__(self, model: TargetVAE, train_cfg: TrainConfig,
                 minibatch_size: Optional[int] = None):
        self.model = model
        self.cfg = train_cfg
        self.batch = minibatch_size or train_cfg.minibatch_size
        self.opt = make_optimizer(train_cfg.learning_rate)
        self.compute_dtype = (jnp.bfloat16
                              if train_cfg.compute_dtype == "bfloat16" else None)
        # pallas_call custom calls cannot be partitioned by GSPMD. On any
        # mesh the loss instead runs per-shard inside shard_map
        # (attach_mesh) so every Pallas kernel still fires on its local
        # batch slice: the batch is split over BOTH mesh axes and the
        # TP-sharded params are all-gathered at the loss boundary (~3M
        # params — a few MB over ICI, amortized against the kernels' step
        # win). --sp gets its own kernel shard_map path (_loss_fn_sp:
        # all_to_all batch<->cell re-sharding around the per-shard Pallas
        # posterior). Only ragged tail batches fall back to the numerically
        # equivalent XLA tiers under GSPMD.
        self._allow_kernels = (train_cfg.dp * train_cfg.tp) <= 1
        self._sp = bool(getattr(train_cfg, "sp", False))
        self._mesh = None
        self._x_coord = model.base_grid()

        # Raise the per-fusion scoped-VMEM budget on TPU for big-k-tier
        # configs whose lift conv output grid is at least the image
        # (padding >= k/2, e.g. dsprites k=64/pad=32 -> H'=65): there the
        # conv emitter fails its preferred window config under the default
        # budget and retries with 6.6x-worse blocking (dsprites fwd conv
        # 97.7M est. cycles at 1.1 MB scoped vs 13.9M at 10 MB; measured
        # 40.7 -> 34.8 ms/step; 16 MiB is NOT enough to unlock it). Every
        # other measured config is ~2% SLOWER under the raised budget
        # (flagship 5098 -> 4984 img/s; galaxy 34.4 -> 35.1; particles-ctf
        # 65.1 -> 65.9 — their convs already get their preferred configs),
        # so they keep the default. TARGETVAE_SCOPED_VMEM_KIB overrides
        # either way (0 disables — escape hatch if a config VMEM-OOMs).
        from ..models.encoders import _use_encoder_kernel
        ecfg = model.cfg.encoder
        big_k_tier = (ecfg.mode == "C"
                      and self._kernels_would_engage()
                      and not _use_encoder_kernel(ecfg, self.compute_dtype))
        wants_budget = big_k_tier and 2 * ecfg.padding >= ecfg.kernels_size
        kib = os.environ.get("TARGETVAE_SCOPED_VMEM_KIB",
                             "65536" if wants_budget else "0")
        copts = ({"xla_tpu_scoped_vmem_limit_kib": kib}
                 if jax.default_backend() == "tpu" and kib != "0" else None)
        self._train_scan = jax.jit(self._epoch_scan_impl, donate_argnums=0,
                                   static_argnames=("n_batches", "batch"),
                                   compiler_options=copts)
        self._train_step = jax.jit(self._step_impl, donate_argnums=0,
                                   compiler_options=copts)
        self._eval_scan = jax.jit(self._eval_scan_impl,
                                  static_argnames=("n_batches", "batch"),
                                  compiler_options=copts)
        self._eval_step = jax.jit(self._eval_impl, compiler_options=copts)

    # -- construction ------------------------------------------------------
    def init_state(self, seed: int = 0) -> TrainState:
        k_init, k_run = jax.random.split(jax.random.key(seed))
        params = self.model.init(k_init)
        return create_train_state(params, self.cfg.learning_rate, k_run)

    # -- mesh attachment ---------------------------------------------------
    def attach_mesh(self, mesh) -> None:
        """Called by fit() after building the ('data','model') mesh. The
        loss is wrapped in shard_map (batch split over both axes) so the
        Pallas kernel tiers run per shard; --sp keeps pure GSPMD + the
        grid-sharded posterior instead."""
        self._mesh = mesh

    def _kernels_would_engage(self) -> bool:
        return (self.compute_dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
                and not os.environ.get("TARGETVAE_DISABLE_PALLAS"))

    def _use_mesh_shardmap(self) -> bool:
        return (self._mesh is not None
                and not self._sp
                and self._kernels_would_engage())

    # kept as an alias: tests/docs reference the DP-era name
    _use_dp_shardmap = _use_mesh_shardmap

    def _use_sp_shardmap(self) -> bool:
        """--sp with the kernels live (_loss_fn_sp): needs a model axis to
        shard cells over and an attention mode."""
        if not (self._sp and self._mesh is not None
                and self._kernels_would_engage()):
            return False
        return (dict(self._mesh.shape).get("model", 1) > 1
                and self.model.cfg.encoder.mode in ("B", "C"))

    # -- core loss/step ----------------------------------------------------
    def _sp_ctx(self, batch_size: int):
        """(mesh, 'model') when the grid-sharded posterior applies: --sp on,
        a model axis to shard over, and the batch splitting evenly over
        'data' (shard_map needs even shards; ragged tails fall back)."""
        if not (self._sp and self._mesh is not None):
            return None
        shape = dict(self._mesh.shape)
        if shape.get("model", 1) <= 1 or batch_size % shape["data"]:
            return None
        return (self._mesh, "model")

    def _loss_fn(self, params, y, key, ctf, w=None):
        # bf16-wire streamed batches (data/pipeline wire_dtype) are upcast
        # back to f32 on device: the halved H2D bytes are the point, and
        # upcasting here keeps the model's internal dtype flow identical to
        # the f32 wire (the rounding already happened on the wire)
        if y.dtype == jnp.bfloat16:
            y = y.astype(jnp.float32)
        if ctf is not None and ctf.dtype == jnp.bfloat16:
            ctf = ctf.astype(jnp.float32)
        # Ragged tail batches are padded by the caller (train_epoch/
        # eval_epoch) to the next mesh-divisible size with ZERO-WEIGHT rows
        # (w sums to 1 over the real rows), so they keep the kernel
        # shard_map path instead of falling back to the GSPMD tier — whose
        # backward all-gathers per-data-shard lift/decoder activations over
        # 'model' (ROADMAP round-3 HLO finding). The GSPMD fallback remains
        # only for batches that arrive ragged through the raw step API.
        even = (self._mesh is not None
                and y.shape[0] % self._mesh.size == 0)
        if even and self._use_mesh_shardmap():
            return self._loss_fn_dp(params, y, key, ctf, w)
        if even and self._use_sp_shardmap():
            return self._loss_fn_sp(params, y, key, ctf, w)
        elbo, log_p, kl = compute_elbo(params, self.model.cfg, self._x_coord,
                                       y, key, ctf=ctf,
                                       compute_dtype=self.compute_dtype,
                                       allow_kernels=self._allow_kernels,
                                       sp=self._sp_ctx(y.shape[0]),
                                       row_weights=w)
        return -elbo, (log_p, kl)

    def _loss_fn_dp(self, params, y, key, ctf, w=None):
        """Per-shard loss under shard_map: the batch is split over BOTH mesh
        axes (so a ('data','model') mesh keeps every device computing with
        the fused kernels live), the TP-sharded params are gathered to the
        P() spec at the boundary, and scalars are pmean'd over the whole
        mesh. Equal shard sizes are guaranteed by the caller's
        batch % mesh.size check. The PRNG key is folded with the flattened
        shard index — sampling matches the single-device run in
        distribution, not bitwise."""
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            extra = {"check_vma": False}   # pallas_call carries no vma info
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
            extra = {"check_rep": False}

        axes = ("data", "model")

        def local(params, y, ctf, key, w):
            idx = (jax.lax.axis_index("data") * jax.lax.axis_size("model")
                   + jax.lax.axis_index("model"))
            k = jax.random.fold_in(key, idx)
            elbo, log_p, kl = compute_elbo(
                params, self.model.cfg, self._x_coord, y, k, ctf=ctf,
                compute_dtype=self.compute_dtype, allow_kernels=True,
                row_weights=w)
            # zero-weight-padded tails carry caller-normalized weighted SUMS
            # per shard: psum composes them; unweighted shards pmean
            red = jax.lax.pmean if w is None else jax.lax.psum
            return (red(-elbo, axes), (red(log_p, axes), red(kl, axes)))

        sm = shard_map(
            local, mesh=self._mesh,
            in_specs=(P(), P(axes), P(axes) if ctf is not None else P(),
                      P(), P(axes) if w is not None else P()),
            out_specs=(P(), (P(), P())), **extra)
        return sm(params, y, ctf, key, w)

    def _loss_fn_sp(self, params, y, key, ctf, w=None):
        """--sp composed with the fused kernels (Ulysses-style SP).

        Encoder and decoder run on batch shards over BOTH mesh axes with the
        Pallas kernels live (like _loss_fn_dp); an all_to_all over 'model'
        re-shards the posterior inputs from batch-split to cell-split; the
        per-shard Pallas posterior kernel emits local partials combined with
        the cross-device LSE/psum (parallel/grid_softmax.sp_posterior_kernel
        — SURVEY section 5's "Pallas blockwise softmax"). The psum'd moments
        come back replicated over 'model'; each rank slices its own batch
        rows back out for the decoder, so rows stay aligned with its local
        y/ctf shards."""
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            extra = {"check_vma": False}
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
            extra = {"check_rep": False}
        from ..losses.elbo import reconstruct_log_prob, sp_cell_views
        from ..models.encoders import encoder_apply
        from ..parallel.grid_softmax import (sharded_log_softmax,
                                             sp_posterior_kernel)

        cfg = self.model.cfg
        ecfg = cfg.encoder
        zd = ecfg.z_dim
        axes = ("data", "model")
        T = dict(self._mesh.shape)["model"]

        def local(params, y, ctf, key, w):
            b_l = y.shape[0]
            d_idx = jax.lax.axis_index("data")
            t_idx = jax.lax.axis_index("model")
            # fold with the data index only: draws below must be identical
            # across 'model' ranks (the moments they scale are replicated)
            k = jax.random.fold_in(key, d_idx)
            k_noise, k_z, k_theta = jax.random.split(k, 3)

            enc = encoder_apply(params["encoder"], ecfg, y, None,
                                compute_dtype=self.compute_dtype,
                                allow_kernels=True, skip_posterior=True)
            cv = sp_cell_views(enc, ecfg, b_l)
            cells = cv["cells"]
            # pad so every local shard is a multiple of 1024 (the SP kernel's
            # tiling unit); -1e30 pads carry exactly-zero posterior mass
            ct = -(-cells // (T * 1024)) * (T * 1024)
            pad = ct - cells
            attn, th_mu, th_ls = cv["attn"], cv["th_mu"], cv["th_ls"]
            z_mu, z_ls = cv["z_mu"], cv["z_ls"]
            log_prior, grid_cells, offs_cells = (
                cv["log_prior"], cv["grid_cells"], cv["offs_cells"])
            if pad:
                attn = jnp.pad(attn, ((0, 0), (0, pad)),
                               constant_values=-1e30)
                th_mu = jnp.pad(th_mu, ((0, 0), (0, pad)))
                th_ls = jnp.pad(th_ls, ((0, 0), (0, pad)))
                z_mu = jnp.pad(z_mu, ((0, 0), (0, pad), (0, 0)))
                z_ls = jnp.pad(z_ls, ((0, 0), (0, pad), (0, 0)))
                log_prior = jnp.pad(log_prior, (0, pad),
                                    constant_values=-1e30)
                grid_cells = jnp.pad(grid_cells, ((0, pad), (0, 0)))
                offs_cells = jnp.pad(offs_cells, (0, pad))

            # batch-split -> cell-split over 'model' (Ulysses exchange)
            a2a = lambda v: jax.lax.all_to_all(v, "model", split_axis=1,
                                               concat_axis=0, tiled=True)
            attn, th_mu, th_ls = a2a(attn), a2a(th_mu), a2a(th_ls)
            z_mu, z_ls = a2a(z_mu), a2a(z_ls)
            c_loc = ct // T
            bd = b_l * T          # rows now = the data-shard's full batch
            sl = lambda v: jax.lax.dynamic_slice_in_dim(
                v, t_idx * c_loc, c_loc, 0)
            p_loc = sharded_log_softmax(sl(log_prior)[None, :], "model")[0]
            gxy = sl(grid_cells)
            offs_loc = sl(offs_cells)
            noise = jax.random.gumbel(jax.random.fold_in(k_noise, t_idx),
                                      (bd, c_loc), jnp.float32)
            th = jnp.stack([th_mu, th_ls], axis=1)              # (bd, 2, C)
            zst = jnp.stack([jnp.transpose(z_mu, (0, 2, 1)),
                             jnp.transpose(z_ls, (0, 2, 1))],
                            axis=1)                             # (bd,2,zd,C)
            out = sp_posterior_kernel(
                "model", cv["sig_r"], zd, False,
                attn, noise, th, zst, p_loc, gxy[:, 0], gxy[:, 1], offs_loc)
            z = (out[:, zd:2 * zd] * jax.random.normal(k_z, (bd, zd))
                 + out[:, :zd])
            theta = (out[:, 2 * zd + 1] * jax.random.normal(k_theta, (bd,))
                     + out[:, 2 * zd])
            dx = out[:, 2 * zd + 2:2 * zd + 4]
            kl = out[:, 2 * zd + 4]
            # slice this rank's own batch rows back out (row s*b_l + r of the
            # all_to_all result is source rank s's local row r)
            row = lambda v: jax.lax.dynamic_slice_in_dim(
                v, t_idx * b_l, b_l, 0)
            log_p = reconstruct_log_prob(
                params, cfg, self._x_coord, y, row(theta), row(dx), row(z),
                ctf=ctf, compute_dtype=self.compute_dtype, allow_kernels=True,
                row_weights=w)
            kl_div = (jnp.mean(row(kl)) if w is None
                      else jnp.dot(w, row(kl)))
            red = jax.lax.pmean if w is None else jax.lax.psum
            return (red(kl_div - log_p, axes),
                    (red(log_p, axes), red(kl_div, axes)))

        sm = shard_map(
            local, mesh=self._mesh,
            in_specs=(P(), P(axes), P(axes) if ctf is not None else P(),
                      P(), P(axes) if w is not None else P()),
            out_specs=(P(), (P(), P())), **extra)
        return sm(params, y, ctf, key, w)

    def _step_impl(self, state: TrainState, y, ctf=None, w=None):
        key, sub = jax.random.split(state.key)
        (neg_elbo, (log_p, kl)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state.params, y, sub, ctf, w)
        updates, opt_state = self.opt.update(grads, state.opt_state,
                                             state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, key=key)
        if self._mesh is not None:
            # pin the output state to shard_state's layout: left to itself
            # XLA re-lays-out the Adam moments (bias mu/nu P() -> P('model')),
            # so the SECOND step of every mesh run would see different input
            # shardings and retrace — one whole extra compile per run
            from ..parallel.mesh import param_shardings
            new_state = jax.lax.with_sharding_constraint(
                new_state, param_shardings(self._mesh, new_state))
        return new_state, jnp.stack([-neg_elbo, log_p, kl])

    def _eval_impl(self, state: TrainState, y, key, ctf=None, w=None):
        neg_elbo, (log_p, kl) = self._loss_fn(state.params, y, key, ctf, w)
        return jnp.stack([-neg_elbo, log_p, kl])

    # -- whole-epoch scans -------------------------------------------------
    def _epoch_scan_impl(self, state: TrainState, data, ctf, perm, *,
                         n_batches: int, batch: int):
        idx = perm[:n_batches * batch].reshape(n_batches, batch)

        def body(st, ib):
            y = jnp.take(data, ib, axis=0)
            c = jnp.take(ctf, ib, axis=0) if ctf is not None else None
            st, m = self._step_impl(st, y, c)
            return st, m

        state, metrics = jax.lax.scan(body, state, idx)
        return state, metrics

    def _eval_scan_impl(self, state: TrainState, data, ctf, key, *,
                        n_batches: int, batch: int):
        idx = jnp.arange(n_batches * batch).reshape(n_batches, batch)
        keys = jax.random.split(key, n_batches)

        def body(carry, inp):
            ib, k = inp
            y = jnp.take(data, ib, axis=0)
            c = jnp.take(ctf, ib, axis=0) if ctf is not None else None
            return carry, self._eval_impl(state, y, k, c)

        _, metrics = jax.lax.scan(body, None, (idx, keys))
        return metrics

    # batches per scan chunk when a progress callback wants mid-epoch
    # reports; one chunk ~= a second of device work at flagship step times
    progress_chunk = 50

    # -- public API --------------------------------------------------------
    def train_epoch(self, state: TrainState, data: jnp.ndarray,
                    ctf: Optional[jnp.ndarray] = None,
                    progress=None,
                    ) -> Tuple[TrainState, Tuple[float, float, float]]:
        """One epoch over `data` (N, H, W, C). Returns (state, (elbo, gen_loss,
        kl)) with gen_loss = -log_p, matching the reference's reported Error.

        progress: optional callback(images_seen, elbo, gen_loss, kl) called
        with the reference's streaming-mean accumulators
        (train_mnist.py:326-345) every `progress_chunk` batches. The epoch
        scan is chunked so the device keeps running while the host reports:
        chunk k+1 is dispatched before chunk k's metrics are read."""
        n = data.shape[0]
        b = min(self.batch, n)
        # derive the shuffle deterministically from the state key
        key, sub = jax.random.split(state.key)
        state = state._replace(key=key)
        perm = jax.random.permutation(sub, n)

        n_full = n // b
        chunk = n_full if progress is None else min(self.progress_chunk,
                                                    n_full)
        metrics = []
        weights = []
        seen = 0
        pending = None                 # device metrics of the previous chunk
        done = 0
        while done < n_full:
            take = min(chunk, n_full - done)
            # same split/permutation as one whole-epoch scan: the chunk just
            # consumes the next `take` index rows
            sub_perm = perm[done * b:(done + take) * b]
            state, m = self._train_scan(state, data, ctf, sub_perm,
                                        n_batches=take, batch=b)
            done += take
            if pending is not None:    # blocks on the PREVIOUS chunk only
                host = np.asarray(pending)
                metrics.append(host)
                seen += host.shape[0] * b
                weights += [float(b)] * host.shape[0]
                if progress is not None:
                    progress(seen, *_streaming_means(metrics, weights))
            pending = m
        if pending is not None:
            host = np.asarray(pending)
            metrics.append(host)
            seen += host.shape[0] * b
            weights += [float(b)] * host.shape[0]

        rem = n - n_full * b
        if rem:
            tail, w = self._pad_tail(perm[n_full * b:], rem)
            y = jnp.take(data, tail, axis=0)
            c = jnp.take(ctf, tail, axis=0) if ctf is not None else None
            state, m = self._train_step(state, y, c, w)
            metrics.append(np.asarray(m)[None])
            weights.append(float(rem))
        return state, _weighted_mean(np.concatenate(metrics), weights)

    def _pad_tail(self, tail, rem: int):
        """Pad a ragged tail's index vector to the next mesh-divisible size
        by repeating its first row with ZERO weight, so the last step of an
        unaligned epoch keeps the kernel shard_map path instead of the
        activation-all-gathering GSPMD fallback (VERDICT r3 #3). The real
        rows carry weight 1/rem — the loss, gradients, and reported metrics
        equal the unpadded tail's batch means (reference drop_last=False
        semantics, train_mnist.py:586-587)."""
        pad = 0 if self._mesh is None else (-rem) % self._mesh.size
        if not pad:
            return tail, None
        tail = jnp.concatenate([tail, jnp.broadcast_to(tail[:1], (pad,))])
        w = jnp.concatenate([jnp.full((rem,), 1.0 / rem, jnp.float32),
                             jnp.zeros((pad,), jnp.float32)])
        return tail, w

    def train_epoch_stream(self, state: TrainState, batches, progress=None,
                           ) -> Tuple[TrainState, Tuple[float, float, float]]:
        """One epoch over a host iterator of StreamBatch(y, ctf, w, n_real)
        device batches (see data/pipeline.HostDataPipeline) — the streaming
        path for datasets that don't fit in HBM. The pipeline emits every
        batch at the fixed batch size (ragged tails arrive zero-weight
        padded), so the whole epoch — tail included — reuses ONE compiled
        step and, on a mesh, stays on the kernel shard_map path. Bare
        (y, ctf) iterators remain accepted for ad-hoc feeding.

        progress: optional callback(images_seen, elbo, gen_loss, kl), called
        after every minibatch like the reference's \\r stderr line."""
        metrics = []
        weights = []
        seen = 0
        for b in batches:
            y, ctf, w, n_real = _unpack_stream_batch(b)
            state, m = self._train_step(state, y, ctf, w)
            metrics.append(np.asarray(m)[None])
            weights.append(float(n_real))
            seen += int(n_real)
            if progress is not None:
                progress(seen, *_streaming_means(metrics, weights))
        return state, _weighted_mean(np.concatenate(metrics), weights)

    def eval_epoch_stream(self, state: TrainState, batches, seed: int = 0,
                          ) -> Tuple[float, float, float]:
        """Evaluation over a host iterator of StreamBatch batches (see
        data/pipeline.HostDataPipeline, shuffle=False) — the streaming
        analog of eval_epoch for test splits that don't fit in HBM. Same
        fixed-size/zero-weight-tail contract as train_epoch_stream: one
        compiled eval step serves the whole pass."""
        key = jax.random.key(seed)
        metrics = []
        weights = []
        for i, b in enumerate(batches):
            y, ctf, w, n_real = _unpack_stream_batch(b)
            m = self._eval_step(state, y, jax.random.fold_in(key, i), ctf, w)
            metrics.append(np.asarray(m)[None])
            weights.append(float(n_real))
        return _weighted_mean(np.concatenate(metrics), weights)

    def eval_epoch(self, state: TrainState, data: jnp.ndarray,
                   ctf: Optional[jnp.ndarray] = None, seed: int = 0,
                   ) -> Tuple[float, float, float]:
        n = data.shape[0]
        b = min(self.batch, n)
        n_full = n // b
        key = jax.random.key(seed)
        metrics = []
        weights = []
        if n_full:
            m = self._eval_scan(state, data, ctf, key, n_batches=n_full,
                                batch=b)
            metrics.append(np.asarray(m))
            weights += [float(b)] * n_full
        rem = n - n_full * b
        if rem:
            tail, w = self._pad_tail(jnp.arange(n_full * b, n), rem)
            y = jnp.take(data, tail, axis=0)
            c = jnp.take(ctf, tail, axis=0) if ctf is not None else None
            m = self._eval_step(state, y, jax.random.fold_in(key, 1), c, w)
            metrics.append(np.asarray(m)[None])
            weights.append(float(rem))
        return _weighted_mean(np.concatenate(metrics), weights)


def _unpack_stream_batch(b) -> Tuple:
    """(y, ctf, w, n_real) from a StreamBatch (data/pipeline) or a bare
    (y, ctf) pair — the one place the streamed-batch contract is decoded."""
    if len(b) == 2:
        y, ctf = b
        return y, ctf, None, int(y.shape[0])
    y, ctf, w, n_real = b
    return y, ctf, w, int(n_real)


def _weighted_mean(metrics: np.ndarray, weights) -> Tuple[float, float, float]:
    """metrics (nb, 3) of (elbo, log_p, kl) -> (elbo, gen_loss, kl)."""
    w = np.asarray(weights)[:, None]
    m = (metrics * w).sum(0) / w.sum()
    return float(m[0]), float(-m[1]), float(m[2])


def _streaming_means(metrics, weights) -> Tuple[float, float, float]:
    """Running (elbo, gen_loss, kl) over the batches seen so far — the
    weighted mean the reference's per-minibatch accumulators converge to
    (train_mnist.py:330-338)."""
    return _weighted_mean(np.concatenate(metrics), weights)
