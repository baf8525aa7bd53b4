"""Multi-host (DCN) initialization.

Within a slice, parallelism rides ICI via the ('data', 'model') mesh
(mesh.py); across hosts, jax.distributed wires the DCN control plane and the
same pjit programs span all processes — no custom transport (SURVEY.md
section 2.8). Call initialize() once at program start on every host.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op in
    single-process runs with no configuration present."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(model: int = 1):
    """A ('data', 'model') mesh over ALL processes' devices (DP across hosts
    over DCN, TP within the slice over ICI)."""
    import jax

    from .mesh import make_mesh
    return make_mesh(jax.devices(), model=model)
