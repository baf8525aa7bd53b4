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
        # pallas_call custom calls cannot be partitioned by GSPMD. On a
        # DP-only mesh the loss runs per-shard inside shard_map (attach_mesh)
        # so every Pallas kernel still fires on its local batch; with a
        # 'model' (TP) axis the params are sharded and the numerically
        # equivalent XLA tiers run instead (they shard cleanly).
        self._allow_kernels = (train_cfg.dp * train_cfg.tp) <= 1
        self._sp = bool(getattr(train_cfg, "sp", False))
        self._mesh = None
        self._x_coord = model.base_grid()

        self._train_scan = jax.jit(self._epoch_scan_impl, donate_argnums=0,
                                   static_argnames=("n_batches", "batch"))
        self._train_step = jax.jit(self._step_impl, donate_argnums=0)
        self._eval_scan = jax.jit(self._eval_scan_impl,
                                  static_argnames=("n_batches", "batch"))
        self._eval_step = jax.jit(self._eval_impl)

    # -- construction ------------------------------------------------------
    def init_state(self, seed: int = 0) -> TrainState:
        k_init, k_run = jax.random.split(jax.random.key(seed))
        params = self.model.init(k_init)
        return create_train_state(params, self.cfg.learning_rate, k_run)

    # -- mesh attachment ---------------------------------------------------
    def attach_mesh(self, mesh) -> None:
        """Called by fit() after building the ('data','model') mesh. On a
        DP-only mesh (model axis 1) the loss is wrapped in shard_map so the
        Pallas kernel tiers run per data shard; any TP keeps pure GSPMD."""
        self._mesh = mesh

    def _kernels_would_engage(self) -> bool:
        import os
        return (self.compute_dtype == jnp.bfloat16
                and jax.default_backend() == "tpu"
                and not os.environ.get("TARGETVAE_DISABLE_PALLAS"))

    def _use_dp_shardmap(self) -> bool:
        return (self._mesh is not None
                and dict(self._mesh.shape).get("model", 1) == 1
                and self._kernels_would_engage())

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
        if (self._use_dp_shardmap()
                and y.shape[0] % dict(self._mesh.shape)["data"] == 0):
            return self._loss_fn_dp(params, y, key, ctf)
        elbo, log_p, kl = compute_elbo(params, self.model.cfg, self._x_coord,
                                       y, key, ctf=ctf,
                                       compute_dtype=self.compute_dtype,
                                       allow_kernels=self._allow_kernels,
                                       sp=self._sp_ctx(y.shape[0]))
        return -elbo, (log_p, kl)

    def _loss_fn_dp(self, params, y, key, ctf):
        """Per-shard loss on a DP-only mesh: each shard runs the full fused
        kernel path on its local batch, scalars are pmean'd (fit() enforces
        minibatch % dp == 0, so shards are equal-sized). The PRNG key is
        folded with the shard index — sampling matches the single-device run
        in distribution, not bitwise."""
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
            extra = {"check_vma": False}   # pallas_call carries no vma info
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map
            extra = {"check_rep": False}

        def local(params, y, ctf, key):
            k = jax.random.fold_in(key, jax.lax.axis_index("data"))
            elbo, log_p, kl = compute_elbo(
                params, self.model.cfg, self._x_coord, y, k, ctf=ctf,
                compute_dtype=self.compute_dtype, allow_kernels=True)
            return (jax.lax.pmean(-elbo, "data"),
                    (jax.lax.pmean(log_p, "data"),
                     jax.lax.pmean(kl, "data")))

        sm = shard_map(
            local, mesh=self._mesh,
            in_specs=(P(), P("data"), P("data") if ctf is not None else P(),
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

    # -- public API --------------------------------------------------------
    def train_epoch(self, state: TrainState, data: jnp.ndarray,
                    ctf: Optional[jnp.ndarray] = None,
                    ) -> Tuple[TrainState, Tuple[float, float, float]]:
        """One epoch over `data` (N, H, W, C). Returns (state, (elbo, gen_loss,
        kl)) with gen_loss = -log_p, matching the reference's reported Error."""
        n = data.shape[0]
        b = min(self.batch, n)
        # derive the shuffle deterministically from the state key
        key, sub = jax.random.split(state.key)
        state = state._replace(key=key)
        perm = jax.random.permutation(sub, n)

        n_full = n // b
        state, metrics = self._train_scan(state, data, ctf, perm,
                                          n_batches=n_full, batch=b)
        weights = [float(b)] * n_full
        metrics = [np.asarray(metrics)]
        rem = n - n_full * b
        if rem:
            tail = perm[n_full * b:]
            y = jnp.take(data, tail, axis=0)
            c = jnp.take(ctf, tail, axis=0) if ctf is not None else None
            state, m = self._train_step(state, y, c)
            metrics.append(np.asarray(m)[None])
            weights.append(float(rem))
        return state, _weighted_mean(np.concatenate(metrics), weights)

    def train_epoch_stream(self, state: TrainState, batches,
                           ) -> Tuple[TrainState, Tuple[float, float, float]]:
        """One epoch over a host iterator of (y, ctf) device batches (see
        data/pipeline.HostDataPipeline) — the streaming path for datasets that
        don't fit in HBM. Batches of equal size reuse one compiled step."""
        metrics = []
        weights = []
        for y, ctf in batches:
            state, m = self._train_step(state, y, ctf)
            metrics.append(np.asarray(m)[None])
            weights.append(float(y.shape[0]))
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
