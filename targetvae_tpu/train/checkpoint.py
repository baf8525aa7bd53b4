"""Checkpoint save/restore.

Format: a single msgpack file holding {config json, params, step, metadata}
(via flax.serialization) — explicit (params + config) instead of the
reference's pickled whole modules (src/utils.py:37-48), while keeping the same
filename roles: `inference.sav` / `generator.sav` are what the clustering CLIs
consume, so we write those names with the matching sub-tree in each.

Unlike the reference, optimizer state and RNG key can be included for true
resume (the reference has no resume path at all — SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..utils.config import ModelConfig

_MAGIC = b"TVAE-TPU-CKPT-1\n"


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, cfg: ModelConfig,
                    step: int = 0, extra: Optional[dict] = None) -> None:
    payload = {
        "config": cfg.to_json(),
        "step": step,
        "params": _to_host(params),
    }
    if extra is not None:
        payload["extra"] = _to_host(extra)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Tuple[Any, ModelConfig, dict]:
    """Returns (params, config, payload)."""
    with open(path, "rb") as f:
        head = f.read(len(_MAGIC))
        if head != _MAGIC:
            raise ValueError(f"{path} is not a targetvae_tpu checkpoint")
        payload = serialization.msgpack_restore(f.read())
    cfg = ModelConfig.from_json(payload["config"])
    return payload["params"], cfg, payload


def save_model_pair(path_prefix: str, params: Any, cfg: ModelConfig,
                    step: int = 0, suffix: str = "") -> None:
    """Write generator{suffix}.sav + inference{suffix}.sav (the reference's
    train->cluster handoff filenames, train_mnist.py:672-681)."""
    save_checkpoint(os.path.join(path_prefix, f"generator{suffix}.sav"),
                    {"generator": params["generator"]}, cfg, step)
    save_checkpoint(os.path.join(path_prefix, f"inference{suffix}.sav"),
                    {"encoder": params["encoder"]}, cfg, step)
