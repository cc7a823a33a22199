"""Checkpoint/resume.

Layout mirrors the reference (`/root/reference/stylex/stylex_train.py:
1736-1774`): ``models/<name>/model_<num>.ckpt`` next to a ``.config.json``,
with EMA weights inside the same state blob and the step count reconstructed
as ``num * save_every`` on load. Serialisation is flax msgpack (single file,
host-independent); optimizer state is saved too — an improvement over the
reference, which silently resets Adam moments on resume (SURVEY §5.4).
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]

_CKPT_RE = re.compile(r"model_(\d+)\.ckpt$")


def save_checkpoint(models_dir: str, name: str, num: int, state, extra: Optional[Dict[str, Any]] = None) -> str:
    """Serialise a train state (or raw params pytree) to
    ``<models_dir>/<name>/model_<num>.ckpt``."""
    d = Path(models_dir) / name
    d.mkdir(parents=True, exist_ok=True)
    payload = {"state": serialization.to_state_dict(state)}
    if extra:
        payload.update(extra)
    path = d / f"model_{num}.ckpt"
    path.write_bytes(serialization.msgpack_serialize(jax.tree.map(lambda x: jax.device_get(x), payload)))
    return str(path)


def latest_checkpoint(models_dir: str, name: str) -> Optional[Tuple[int, str]]:
    """Highest-numbered checkpoint, like ``Trainer.load(num=-1)``
    (`stylex_train.py:1748-1764`)."""
    d = Path(models_dir) / name
    if not d.exists():
        return None
    best = None
    for f in d.iterdir():
        m = _CKPT_RE.search(f.name)
        if m:
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, str(f))
    return best


def load_checkpoint(path: str, state_template):
    """Restore into a template pytree (shapes/dtypes must match).

    Leaves come back as committed device arrays with the template's dtype
    and sharding — ``from_state_dict`` alone returns host numpy arrays,
    which silently disable ``donate_argnums`` on the jitted train step and
    change its compile options, forcing a full recompile on every resume
    (observed: a 37-minute remote recompile of an already-cached step).
    """
    import jax
    import jax.numpy as jnp

    payload = serialization.msgpack_restore(Path(path).read_bytes())
    restored = serialization.from_state_dict(state_template, payload["state"])

    def place(t, v):
        if not hasattr(t, "dtype"):
            return v
        arr = jnp.asarray(v, getattr(t, "dtype", None))
        sharding = getattr(t, "sharding", None)
        return jax.device_put(arr, sharding) if sharding is not None else arr

    return jax.tree.map(place, state_template, restored)
