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
        # mesh the loss can instead run per-shard inside shard_map
        # (attach_mesh) so every Pallas kernel still fires on its local
        # batch slice: the batch is split over BOTH mesh axes and the
        # TP-sharded params are all-gathered at the loss boundary (~3M
        # params — a few MB over ICI, amortized against the kernels' step
        # win). Outside shard_map (ragged tails, --sp) the numerically
        # equivalent XLA tiers run and shard cleanly under GSPMD.
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

    def _loss_fn(self, params, y, key, ctf):
        # ragged tail batches can't split evenly across shards: they take the
        # GSPMD/XLA path (kernels off) while full batches keep the kernels
        if (self._use_mesh_shardmap()
                and y.shape[0] % self._mesh.size == 0):
            return self._loss_fn_dp(params, y, key, ctf)
        elbo, log_p, kl = compute_elbo(params, self.model.cfg, self._x_coord,
                                       y, key, ctf=ctf,
                                       compute_dtype=self.compute_dtype,
                                       allow_kernels=self._allow_kernels,
                                       sp=self._sp_ctx(y.shape[0]))
        return -elbo, (log_p, kl)

    def _loss_fn_dp(self, params, y, key, ctf):
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

        def local(params, y, ctf, key):
            idx = (jax.lax.axis_index("data") * jax.lax.axis_size("model")
                   + jax.lax.axis_index("model"))
            k = jax.random.fold_in(key, idx)
            elbo, log_p, kl = compute_elbo(
                params, self.model.cfg, self._x_coord, y, k, ctf=ctf,
                compute_dtype=self.compute_dtype, allow_kernels=True)
            return (jax.lax.pmean(-elbo, axes),
                    (jax.lax.pmean(log_p, axes),
                     jax.lax.pmean(kl, axes)))

        sm = shard_map(
            local, mesh=self._mesh,
            in_specs=(P(), P(axes), P(axes) if ctf is not None else P(),
                      P()),
            out_specs=(P(), (P(), P())), **extra)
        return sm(params, y, ctf, key)

    def _step_impl(self, state: TrainState, y, ctf=None):
        key, sub = jax.random.split(state.key)
        (neg_elbo, (log_p, kl)), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(state.params, y, sub, ctf)
        updates, opt_state = self.opt.update(grads, state.opt_state,
                                             state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, key=key)
        return new_state, jnp.stack([-neg_elbo, log_p, kl])

    def _eval_impl(self, state: TrainState, y, key, ctf=None):
        neg_elbo, (log_p, kl) = self._loss_fn(state.params, y, key, ctf)
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
            tail = perm[n_full * b:]
            y = jnp.take(data, tail, axis=0)
            c = jnp.take(ctf, tail, axis=0) if ctf is not None else None
            state, m = self._train_step(state, y, c)
            metrics.append(np.asarray(m)[None])
            weights.append(float(rem))
        return state, _weighted_mean(np.concatenate(metrics), weights)

    def train_epoch_stream(self, state: TrainState, batches, progress=None,
                           ) -> Tuple[TrainState, Tuple[float, float, float]]:
        """One epoch over a host iterator of (y, ctf) device batches (see
        data/pipeline.HostDataPipeline) — the streaming path for datasets that
        don't fit in HBM. Batches of equal size reuse one compiled step.

        progress: optional callback(images_seen, elbo, gen_loss, kl), called
        after every minibatch like the reference's \\r stderr line."""
        metrics = []
        weights = []
        seen = 0
        for y, ctf in batches:
            state, m = self._train_step(state, y, ctf)
            metrics.append(np.asarray(m)[None])
            weights.append(float(y.shape[0]))
            seen += int(y.shape[0])
            if progress is not None:
                progress(seen, *_streaming_means(metrics, weights))
        return state, _weighted_mean(np.concatenate(metrics), weights)

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
            y = data[n_full * b:]
            c = ctf[n_full * b:] if ctf is not None else None
            m = self._eval_step(state, y, jax.random.fold_in(key, 1), c)
            metrics.append(np.asarray(m)[None])
            weights.append(float(rem))
        return _weighted_mean(np.concatenate(metrics), weights)


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
