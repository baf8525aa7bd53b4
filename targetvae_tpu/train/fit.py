"""The shared outer training loop (epochs, early stopping, LR plateau,
checkpoints) used by every training CLI.

Replicates the reference main() epoch loop behavior (train_mnist.py:626-684):
train epoch -> test eval -> EarlyStopping(patience 20, delta 1e-4) with
best-model save -> ReduceLROnPlateau(max, 0.5, patience 9, 1e-4 abs) ->
periodic epoch snapshots every save_interval epochs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..models.targetvae import TargetVAE
from ..utils.config import TrainConfig
from .checkpoint import save_model_pair
from .loop import Trainer
from .logging import RunLogger
from .schedule import EarlyStopping, ReduceLROnPlateau
from .state import set_learning_rate


def fit(model: TargetVAE, train_cfg: TrainConfig, logger: RunLogger,
        y_train: jnp.ndarray, y_test: jnp.ndarray,
        ctf_train: Optional[jnp.ndarray] = None,
        ctf_test: Optional[jnp.ndarray] = None,
        num_epochs: Optional[int] = None):
    """Returns the final TrainState."""
    trainer = Trainer(model, train_cfg)
    state = trainer.init_state(train_cfg.seed)
    num_epochs = num_epochs or train_cfg.num_epochs
    digits = len(str(num_epochs))

    scheduler = ReduceLROnPlateau(
        train_cfg.learning_rate, mode="max", factor=train_cfg.plateau_factor,
        patience=train_cfg.plateau_patience,
        threshold=train_cfg.plateau_threshold, min_lr=train_cfg.min_lr)

    state_box = {"state": state}

    def save_best():
        save_model_pair(logger.path_prefix, state_box["state"].params,
                        model.cfg, step=int(state_box["state"].step))

    stopper = EarlyStopping(patience=train_cfg.early_patience,
                            delta=train_cfg.early_delta, save_fn=save_best)

    for epoch in range(num_epochs):
        state, (elbo, gen_loss, kl) = trainer.train_epoch(
            state, y_train, ctf_train)
        state_box["state"] = state
        logger.epoch(epoch + 1, "train", elbo, gen_loss, kl)

        elbo_t, gen_loss_t, kl_t = trainer.eval_epoch(
            state, y_test, ctf_test, seed=epoch)
        logger.epoch(epoch + 1, "test", elbo_t, gen_loss_t, kl_t)

        msg = stopper(elbo_t)
        logger.line(msg)
        logger.line("")
        if stopper.early_stop:
            logger.line("*** Early stopping ***")
            break

        prev_lr = scheduler.lr
        new_lr = scheduler.step(elbo_t)
        if new_lr != prev_lr:
            state = set_learning_rate(state, new_lr)
            logger.line(f"# reducing learning rate to {new_lr:g}")

        if (epoch + 1) % train_cfg.save_interval == 0:
            suffix = "_epoch" + str(epoch + 1).zfill(digits)
            save_model_pair(logger.path_prefix, state.params, model.cfg,
                            step=int(state.step), suffix=suffix)

    return state
