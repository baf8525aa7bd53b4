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


def save_train_state(path: str, state, cfg: ModelConfig,
                     host_state: Optional[dict] = None) -> None:
    """Full resume checkpoint: params + optimizer state + PRNG key + host-side
    controller state (epoch, scheduler, early stopping). The reference has no
    resume path at all (SURVEY.md section 5)."""
    from flax import serialization as ser
    extra = {
        "opt_state": ser.to_state_dict(_to_host(state.opt_state)),
        "key": np.asarray(jax.random.key_data(state.key)),
        "host": host_state or {},
    }
    save_checkpoint(path, state.params, cfg, step=int(state.step), extra=extra)


class AsyncCheckpointer:
    """Orbax-style async save (SURVEY.md section 5). The device->host
    snapshot and msgpack serialization happen on the caller thread (the next
    train step donates the state's buffers, so they must be copied out
    first); only the disk write runs on a background thread, so the train
    loop never blocks on IO. wait() joins the in-flight write; a new save
    joins the previous one first (at most one outstanding write; the atomic
    rename in the writer makes the latest state win on disk)."""

    def __init__(self):
        import threading
        self._threading = threading
        self._thread = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, state, cfg: ModelConfig,
             host_state: Optional[dict] = None) -> None:
        from flax import serialization as ser
        self.wait()
        extra = {
            "opt_state": ser.to_state_dict(_to_host(state.opt_state)),
            "key": np.asarray(jax.random.key_data(state.key)),
            "host": _to_host(host_state or {}),
        }
        payload = {
            "config": cfg.to_json(),
            "step": int(state.step),
            "params": _to_host(state.params),
            "extra": extra,
        }
        blob = serialization.msgpack_serialize(payload)

        def write():
            try:
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(_MAGIC)
                    f.write(blob)
                os.replace(tmp, path)
            except BaseException as e:  # surface in wait(): disk full, perms
                self._error = e

        t = self._threading.Thread(target=write, daemon=True)
        t.start()
        self._thread = t

    def wait(self) -> None:
        """Join the in-flight write; re-raise any error it hit, so a failed
        checkpoint (disk full, permissions) is not silently dropped."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise e


def load_train_state(path: str, template_state):
    """Restore a TrainState saved by save_train_state.

    template_state: a freshly-initialized TrainState with the same model/
    optimizer config, used as the structure template.
    """
    from flax import serialization as ser
    params, cfg, payload = load_checkpoint(path)
    extra = payload["extra"]
    opt_state = ser.from_state_dict(template_state.opt_state,
                                    extra["opt_state"])
    key = jax.random.wrap_key_data(jnp_asarray_u32(extra["key"]))
    state = template_state._replace(
        step=jax.numpy.asarray(payload["step"], jax.numpy.int32),
        params=jax.tree.map(jax.numpy.asarray, params),
        opt_state=jax.tree.map(_maybe_asarray, opt_state),
        key=key)
    return state, cfg, extra.get("host", {})


def _maybe_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x) if isinstance(x, np.ndarray) else x


def jnp_asarray_u32(x):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(x), dtype=jnp.uint32)


def save_model_pair(path_prefix: str, params: Any, cfg: ModelConfig,
                    step: int = 0, suffix: str = "") -> None:
    """Write generator{suffix}.sav + inference{suffix}.sav (the reference's
    train->cluster handoff filenames, train_mnist.py:672-681)."""
    save_checkpoint(os.path.join(path_prefix, f"generator{suffix}.sav"),
                    {"generator": params["generator"]}, cfg, step)
    save_checkpoint(os.path.join(path_prefix, f"inference{suffix}.sav"),
                    {"encoder": params["encoder"]}, cfg, step)
