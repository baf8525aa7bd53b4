"""Sharded training-state placement and the multi-chip train step.

The recipe: build the TrainState, compute a NamedSharding tree for it (the
Adam mu/nu trees mirror the params tree, so the same path rules apply),
device_put, and jit — GSPMD propagates the activation shardings and inserts
the gradient psums over 'data' and the head-contraction psums over 'model'.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, param_shardings


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: params/opt-state TP-sharded per
    mesh.py rules, scalars and PRNG key replicated."""
    shardings = param_shardings(mesh, state)
    return jax.device_put(state, shardings)


def shard_batch(mesh: Mesh, y, ctf=None):
    ys = jax.device_put(y, batch_sharding(mesh))
    if ctf is None:
        return ys, None
    return ys, jax.device_put(ctf, batch_sharding(mesh))
