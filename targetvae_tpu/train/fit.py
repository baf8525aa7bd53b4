"""The shared outer training loop (epochs, early stopping, LR plateau,
checkpoints, resume, profiling) used by every training CLI.

Replicates the reference main() epoch loop behavior (train_mnist.py:626-684):
train epoch -> test eval -> EarlyStopping(patience 20, delta 1e-4) with
best-model save -> ReduceLROnPlateau(max, 0.5, patience 9, 1e-4 abs) ->
periodic epoch snapshots every save_interval epochs. Adds what the reference
lacks: a full resume checkpoint (optimizer state + RNG + controller state),
per-epoch throughput logging, and jax.profiler trace capture.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.targetvae import TargetVAE
from ..utils.config import TrainConfig
from .checkpoint import (AsyncCheckpointer, load_train_state,
                         save_model_pair)
from .loop import Trainer
from .logging import RunLogger
from .schedule import EarlyStopping, ReduceLROnPlateau
from .state import set_learning_rate

RESUME_FILE = "training_state.sav"


def fit(model: TargetVAE, train_cfg: TrainConfig, logger: RunLogger,
        y_train: jnp.ndarray, y_test: jnp.ndarray,
        ctf_train: Optional[jnp.ndarray] = None,
        ctf_test: Optional[jnp.ndarray] = None,
        num_epochs: Optional[int] = None,
        resume_dir: Optional[str] = None,
        profile_dir: Optional[str] = None):
    """Returns the final TrainState."""
    trainer = Trainer(model, train_cfg)
    state = trainer.init_state(train_cfg.seed)
    num_epochs = num_epochs or train_cfg.num_epochs
    digits = len(str(num_epochs))

    scheduler = ReduceLROnPlateau(
        train_cfg.learning_rate, mode="max", factor=train_cfg.plateau_factor,
        patience=train_cfg.plateau_patience,
        threshold=train_cfg.plateau_threshold, min_lr=train_cfg.min_lr)
    stopper = EarlyStopping(patience=train_cfg.early_patience,
                            delta=train_cfg.early_delta)
    start_epoch = 0

    if resume_dir:
        ckpt = os.path.join(resume_dir, RESUME_FILE)
        state, _, host = load_train_state(ckpt, state)
        start_epoch = int(host.get("epoch", 0))
        scheduler.lr = float(host.get("lr", scheduler.lr))
        scheduler.best = float(host.get("sched_best", scheduler.best))
        scheduler.num_bad = int(host.get("sched_bad", 0))
        stopper.max_elbo = float(host.get("early_best", stopper.max_elbo))
        stopper.counter = int(host.get("early_counter", 0))
        logger.line(f"# resumed from {ckpt} at epoch {start_epoch}, "
                    f"lr {scheduler.lr:g}")

    if train_cfg.sp:
        if train_cfg.tp <= 1:
            raise SystemExit("--sp shards the posterior grid over the "
                             "'model' mesh axis; it requires --tp > 1")
        if model.cfg.encoder.mode not in ("B", "C"):
            raise SystemExit("--sp needs an attention posterior "
                             "(t_inf=attention)")

    n_mesh = train_cfg.dp * train_cfg.tp
    if n_mesh > 1:
        # ('data', 'model') mesh: DP shards the batch (compiler-inserted
        # gradient psums), TP shards the encoder-kernel / generator-hidden
        # axes per parallel/mesh.py; everything downstream is GSPMD-propagated
        # from these placements. After resume-load so a restored state is
        # sharded too.
        from ..parallel import make_mesh
        from ..parallel.pjit import shard_batch, shard_state
        devs = jax.devices()
        if n_mesh > len(devs):
            raise SystemExit(f"--dp {train_cfg.dp} x --tp {train_cfg.tp} "
                             f"needs {n_mesh} devices, found {len(devs)}")
        if train_cfg.minibatch_size % train_cfg.dp:
            raise SystemExit(f"--minibatch-size {train_cfg.minibatch_size} "
                             f"must be divisible by --dp {train_cfg.dp}")
        mesh = make_mesh(devs[:n_mesh], data=train_cfg.dp,
                         model=train_cfg.tp)
        trainer.attach_mesh(mesh)   # DP-only: per-shard Pallas kernel path
        state = shard_state(mesh, state)
        if not train_cfg.host_stream:
            y_train, ctf_train = shard_batch(mesh, y_train, ctf_train)
            y_test, ctf_test = shard_batch(mesh, y_test, ctf_test)
        logger.line(f"# mesh: data={train_cfg.dp} model={train_cfg.tp} "
                    f"({n_mesh} devices)")
        if (train_cfg.compute_dtype == "bfloat16" and not train_cfg.sp
                and train_cfg.minibatch_size % n_mesh):
            logger.line(f"# note: --minibatch-size "
                        f"{train_cfg.minibatch_size} is not divisible by "
                        f"dp*tp={n_mesh}; the per-shard fused-kernel path "
                        f"is disabled (XLA tiers run instead)")

    train_pipe = test_pipe = None
    if train_cfg.stream_bf16 and not train_cfg.host_stream:
        logger.line("# note: --stream-bf16 only affects --host-stream runs; "
                    "ignored (data is device-resident)")
    if train_cfg.host_stream:
        # threaded host shuffle/gather/prefetch; batches land directly on
        # the device (or sharded over the mesh) — neither split ever
        # resides in HBM as a whole (the test set streams too: a dataset
        # that outgrows HBM usually brings a test split that does as well)
        import numpy as np
        from ..data.pipeline import HostDataPipeline
        sharding = None
        if n_mesh > 1:
            from ..parallel.mesh import batch_sharding
            sharding = batch_sharding(mesh)
        wire_dtype = "bfloat16" if train_cfg.stream_bf16 else None
        train_pipe = HostDataPipeline(
            np.asarray(y_train),
            None if ctf_train is None else np.asarray(ctf_train),
            batch_size=train_cfg.minibatch_size, seed=train_cfg.seed,
            sharding=sharding, wire_dtype=wire_dtype)
        test_pipe = HostDataPipeline(
            np.asarray(y_test),
            None if ctf_test is None else np.asarray(ctf_test),
            batch_size=train_cfg.minibatch_size, seed=train_cfg.seed,
            sharding=sharding, shuffle=False, wire_dtype=wire_dtype)
        wire = " (bf16 wire)" if train_cfg.stream_bf16 else ""
        logger.line(f"# host-streaming train data ({len(train_pipe)} "
                    f"images; test {len(test_pipe)}){wire}")

    state_box = {"state": state}
    stopper.save_fn = lambda: save_model_pair(
        logger.path_prefix, state_box["state"].params, model.cfg,
        step=int(state_box["state"].step))
    ckpt = AsyncCheckpointer()   # resume saves never block the epoch loop

    n_train = int(y_train.shape[0])

    for epoch in range(start_epoch, num_epochs):
        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.start_trace(profile_dir)

        t0 = time.time()
        # per-minibatch/chunk streaming-mean progress, the reference's \r
        # stderr line (train_mnist.py:340-343)
        def report(c, elbo_m, err_m, kl_m, _epoch=epoch):
            logger.progress(f"# [{_epoch + 1}/{num_epochs}] training "
                            f"{c / n_train:.1%}, ELBO={elbo_m:.5f}, "
                            f"Error={err_m:.5f}, KL={kl_m:.5f}")
        if train_pipe is not None:
            state, (elbo, gen_loss, kl) = trainer.train_epoch_stream(
                state, train_pipe.epoch(epoch), progress=report)
        else:
            state, (elbo, gen_loss, kl) = trainer.train_epoch(
                state, y_train, ctf_train, progress=report)
        dt = time.time() - t0
        logger.progress(" " * 100)     # clear the \r progress line
        state_box["state"] = state
        logger.epoch(epoch + 1, "train", elbo, gen_loss, kl)
        logger.progress(f"# epoch {epoch + 1}: {dt:.2f}s, "
                        f"{n_train / dt:.0f} images/sec")

        if test_pipe is not None:
            elbo_t, gen_loss_t, kl_t = trainer.eval_epoch_stream(
                state, test_pipe.epoch(0), seed=epoch)
        else:
            elbo_t, gen_loss_t, kl_t = trainer.eval_epoch(
                state, y_test, ctf_test, seed=epoch)
        logger.epoch(epoch + 1, "test", elbo_t, gen_loss_t, kl_t)

        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
            logger.line(f"# profiler trace written to {profile_dir}")

        msg = stopper(elbo_t)
        logger.line(msg)
        logger.line("")

        prev_lr = scheduler.lr
        new_lr = scheduler.step(elbo_t)
        if new_lr != prev_lr:
            state = set_learning_rate(state, new_lr)
            logger.line(f"# reducing learning rate to {new_lr:g}")

        ckpt.save(
            os.path.join(logger.path_prefix, RESUME_FILE), state, model.cfg,
            host_state={
                "epoch": epoch + 1, "lr": scheduler.lr,
                "sched_best": scheduler.best, "sched_bad": scheduler.num_bad,
                "early_best": stopper.max_elbo,
                "early_counter": stopper.counter,
            })

        if stopper.early_stop:
            logger.line("*** Early stopping ***")
            break

        if (epoch + 1) % train_cfg.save_interval == 0:
            suffix = "_epoch" + str(epoch + 1).zfill(digits)
            save_model_pair(logger.path_prefix, state.params, model.cfg,
                            step=int(state.step), suffix=suffix)

    ckpt.wait()
    return state
