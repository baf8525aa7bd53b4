"""Device mesh and sharding rules.

The reference is single-device (SURVEY.md section 2.8); parallelism here is a
first-class design: a ('data', 'model') mesh over ICI, batch sharded over
'data' (DP; gradient psums inserted by the compiler), and the wide channel
axes — the encoder's 128-kernel dim and the generator's hidden dim — sharded
over 'model' (TP). Activations follow from the param/batch shardings via
GSPMD propagation; the posterior grid softmax contracts over the full grid,
so XLA inserts the cross-device log-sum-exp when the R*H*W axis is sharded.
For explicit grid sharding see grid_softmax.py (the sequence-parallel analog).

Pipeline and expert parallelism are deliberate NON-GOALS at this model scale
(SURVEY.md section 2.8): the model is ~3M parameters with two conceptual
stages; there is nothing to pipeline or route. The axes that matter are batch
(DP), the 128-kernel/hidden channel axes (TP), and the posterior grid /
decoder pixel axes (SP).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Create a ('data', 'model') mesh. Defaults: all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, leaf) -> P:
    """Tensor-parallel layout: shard wide channel axes over 'model'.

    - encoder conv1 weight (out, in, rot_in, k, k): shard `out` (the
      128-kernel axis) -> lifted activations shard their K axis; head matmuls
      contract over K with a compiler-inserted psum.
    - 1x1 head weights (K, d): shard the contraction axis K.
    - generator hidden/out linears (H, d): shard H where it is the input dim,
      and coord/latent projections (d, H) on the output dim.
    """
    if leaf.ndim == 0:
        return P()
    if "encoder/conv1/w" in path and leaf.ndim == 5:
        return P("model")
    if ("conv2/w" in path or "conv_a/w" in path or "conv_r/w" in path
            or "conv_z/w" in path) and leaf.ndim == 2:
        return P("model", None)
    if ("generator/coord_linear/w" in path
            or "generator/latent_linear/w" in path) and leaf.ndim == 2:
        return P(None, "model")
    if ("generator/hidden" in path or "generator/out/w" in path) and leaf.ndim == 2:
        return P("model", None)
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedSharding tree for a TargetVAE params pytree (DP-replicated,
    TP-sharded over 'model' where profitable)."""
    def shard(path, leaf):
        spec = _spec_for_param(_path_str(path), leaf)
        # guard: only shard if the axis divides evenly
        axes = mesh.shape
        ok = True
        for dim, name in zip(leaf.shape, spec):
            if name is not None and dim % axes[name] != 0:
                ok = False
        if not ok:
            spec = P()
        # normalize away trailing Nones: P('model', None) and P('model') are
        # the same sharding but compare unequal in the jit cache key, and
        # XLA reports output shardings in the stripped form — emitting the
        # stripped form here keeps step 2's input shardings equal to step
        # 1's outputs (no spurious retrace)
        t = tuple(spec)
        while t and t[-1] is None:
            t = t[:-1]
        return NamedSharding(mesh, P(*t))
    return jax.tree_util.tree_map_with_path(shard, params)
