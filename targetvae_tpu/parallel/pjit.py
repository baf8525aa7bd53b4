"""Sharded training-state placement and the multi-chip train step.

The recipe: build the TrainState, compute a NamedSharding tree for it (the
Adam mu/nu trees mirror the params tree, so the same path rules apply),
device_put, and jit — GSPMD propagates the activation shardings and inserts
the gradient psums over 'data' and the head-contraction psums over 'model'.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, param_shardings


def shard_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: params/opt-state TP-sharded per
    mesh.py rules, scalars and PRNG key replicated.

    On a multi-process mesh (DCN, parallel/distributed.py) device_put cannot
    target non-addressable devices; each process instead contributes its
    local shards of the (host-identical) state via make_array_from_callback.
    """
    shardings = param_shardings(mesh, state)
    if all(d.process_index == jax.process_index()
           for d in mesh.devices.flat):
        return jax.device_put(state, shardings)

    def put(x, s):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None),
                                 jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            impl = jax.random.key_impl(x)
            extra = data.ndim - len(x.shape)   # key-impl payload dims
            ds = NamedSharding(s.mesh, P(*s.spec, *(None,) * extra))
            arr = jax.make_array_from_callback(data.shape, ds,
                                               lambda idx: data[idx])
            return jax.random.wrap_key_data(arr, impl=impl)
        xn = np.asarray(x)
        return jax.make_array_from_callback(xn.shape, s,
                                            lambda idx: xn[idx])

    return jax.tree.map(put, state, shardings)


def shard_batch(mesh: Mesh, y, ctf=None):
    ys = jax.device_put(y, batch_sharding(mesh))
    if ctf is None:
        return ys, None
    return ys, jax.device_put(ctf, batch_sharding(mesh))
