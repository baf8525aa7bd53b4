"""Training state: params + Adam state + RNG key, with a mutable LR.

The learning rate lives inside the optimizer state (optax.inject_hyperparams)
so the host-side ReduceLROnPlateau controller can update it between epochs
without retracing the jitted train step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    key: jax.Array


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def create_train_state(params: Any, learning_rate: float,
                       key: jax.Array) -> TrainState:
    opt = make_optimizer(learning_rate)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt.init(params), key=key)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    opt_state = state.opt_state
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state._replace(opt_state=opt_state._replace(hyperparams=hyper))


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])
