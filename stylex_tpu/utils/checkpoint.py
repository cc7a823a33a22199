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
import threading
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "AsyncCheckpointWriter",
]

_CKPT_RE = re.compile(r"model_(\d+)\.ckpt$")


def _write_checkpoint_file(path: Path, state, extra: Optional[Dict[str, Any]]) -> None:
    """Fetch + serialise + ATOMICALLY publish (tmp file, then rename): a
    reader can never observe a partially-written checkpoint."""
    payload = {"state": serialization.to_state_dict(state)}
    if extra:
        payload.update(extra)
    blob = serialization.msgpack_serialize(
        jax.tree.map(lambda x: jax.device_get(x), payload)
    )
    tmp = path.with_suffix(".ckpt.tmp")
    tmp.write_bytes(blob)
    os.replace(tmp, path)


def save_checkpoint(models_dir: str, name: str, num: int, state, extra: Optional[Dict[str, Any]] = None) -> str:
    """Serialise a train state (or raw params pytree) to
    ``<models_dir>/<name>/model_<num>.ckpt`` (blocking)."""
    d = Path(models_dir) / name
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"model_{num}.ckpt"
    _write_checkpoint_file(path, state, extra)
    return str(path)


@jax.jit
def _device_snapshot(tree):
    # HBM-to-HBM copy (~0.1 ms/GB at v5e bandwidth). The copy — not the
    # live state — is what the background writer reads, so the train loop
    # may immediately donate the original buffers into the next dispatch.
    import jax.numpy as jnp

    return jax.tree.map(jnp.copy, tree)


class AsyncCheckpointWriter:
    """Background checkpoint writer (one in flight).

    The reference's ``Trainer.save`` blocks the train loop on a full
    state fetch (`/root/reference/stylex/stylex_train.py:1736-1746`) — on
    a relayed TPU that is a measured 45-50 s stall per checkpoint (r3 64px
    campaign logs). ``submit`` instead snapshots the state on device,
    starts async host copies, and hands serialisation + the atomic rename
    to a non-daemon thread: the train loop continues, process exit still
    joins the writer, and ``wait`` (called before any load and by the next
    submit) rethrows writer errors on the main thread.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._exc: Optional[BaseException] = None

    def wait(self) -> None:
        """Join the in-flight write (if any); re-raise its failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def submit(self, models_dir: str, name: str, num: int, state,
               extra: Optional[Dict[str, Any]] = None) -> str:
        self.wait()
        d = Path(models_dir) / name
        d.mkdir(parents=True, exist_ok=True)
        path = d / f"model_{num}.ckpt"
        snap = _device_snapshot(state)
        for leaf in jax.tree.leaves(snap):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        def _write():
            try:
                _write_checkpoint_file(path, snap, extra)
            except BaseException as e:  # surfaced by the next wait()
                self._exc = e

        self._thread = threading.Thread(
            target=_write, name=f"ckpt-write-{name}-{num}", daemon=False
        )
        self._thread.start()
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
    import numpy as np

    payload = serialization.msgpack_restore(Path(path).read_bytes())
    restored = serialization.from_state_dict(state_template, payload["state"])

    def place(t, v):
        if not hasattr(t, "dtype"):
            return v
        # host-side dtype fixup + device_put: never builds an XLA program
        # (jnp.asarray with a dtype change compiles one tiny convert program
        # per leaf — ~0.45 s each through the relay)
        arr = np.asarray(v)
        dt = getattr(t, "dtype", None)
        if dt is not None and arr.dtype != np.dtype(dt):
            arr = arr.astype(dt)
        sharding = getattr(t, "sharding", None)
        return jax.device_put(arr, sharding) if sharding is not None else jax.device_put(arr)

    return jax.tree.map(place, state_template, restored)


def load_checkpoint_inference(path: str, state_template, ship_ema: bool = True,
                              param_dtype=None):
    """Like :func:`load_checkpoint` but ships ONLY params/ema_params/step/
    pl_mean to the device; optimizer slots stay host numpy. Adam moments are
    ~2/3 of a checkpoint's bytes (measured 770 MB at the 64px flagship) and
    a relayed-TPU transfer runs ~6 MB/s — inference consumers (AttFind,
    eval, replay) were blocking ~2 min on state they never read.

    Args:
      ship_ema: ``False`` keeps ``ema_params`` as host numpy too — AttFind
        never reads EMA weights (the notebook sweeps the live ``G``,
        `run_attfind_combined.ipynb` cell 6), and EMA is half the remaining
        hot bytes. An unused host-numpy leaf is never traced, so it is never
        transferred either.
      param_dtype: cast float32 param leaves to this dtype (e.g.
        ``jnp.bfloat16``) ON THE HOST before transfer — halves the relay
        bytes for bf16 sweeps. Non-float32 leaves (ints, counters) keep the
        template dtype.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    payload = serialization.msgpack_restore(Path(path).read_bytes())
    restored = serialization.from_state_dict(state_template, payload["state"])

    def place(t, v, cast_floats: bool):
        if not hasattr(t, "dtype"):
            return v
        dt = getattr(t, "dtype", None)
        if cast_floats and param_dtype is not None and dt == jnp.float32:
            dt = param_dtype
        # cast with numpy/ml_dtypes ON THE HOST and ship with device_put:
        # the wire carries the narrow dtype and no XLA program is built.
        # (jnp.asarray(v, dt) compiles one convert_element_type program PER
        # LEAF — measured 144 programs x ~0.45 s through the relay, i.e.
        # ~65 s of the r5 bf16 AttFind record's checkpoint load.)
        arr = np.asarray(v)
        if arr.dtype != np.dtype(dt):
            arr = arr.astype(dt)
        sharding = getattr(t, "sharding", None)
        return jax.device_put(arr, sharding) if sharding is not None else jax.device_put(arr)

    hot = {"params", "step", "pl_mean"}
    if ship_ema:
        hot.add("ema_params")
    out = {}
    for field in state_template.__dataclass_fields__:
        t_sub = getattr(state_template, field)
        v_sub = getattr(restored, field)
        cast_floats = field in ("params", "ema_params")
        out[field] = (
            jax.tree.map(lambda t, v: place(t, v, cast_floats), t_sub, v_sub)
            if field in hot
            else v_sub
        )
    return state_template.replace(**out)
