"""Host-side parameter initialisation for relayed-TPU processes.

Eager flax ``Module.init`` executes op-by-op: on this container's
tunneled TPU every distinct op shape is a *remote* XLA compile (tens of
seconds each, unreliably cached), so initialising the StylEx nets
eagerly costs minutes of wall clock before any real work starts
(measured: 283 s for ``init_stylex_params`` + a MobileNet init).

``init_on_host`` runs the whole init as ONE jitted program on the local
CPU backend — compiles are local and fast, there are zero relay
round-trips — and then moves the finished tree to the default backend
in a single ``device_put``. When the default backend already is CPU
(the test mesh) it is a plain jit call.

The reference has no analogue (torch initialises on host by default);
this is TPU-plumbing the reference never needed.
"""

from __future__ import annotations

from typing import Callable

import jax

__all__ = ["init_on_host"]


def init_on_host(fn: Callable, *args, dtype=None):
    """Run ``fn(*args)`` as one jitted program on the host CPU and return
    the result on the default backend.

    Args:
      fn: pure function building a pytree of arrays (e.g. a closure over
        ``Module.init`` calls).
      dtype: optional floating dtype; float32 leaves of the result are
        cast inside the same program (so the host->device transfer moves
        the narrow representation).
    """

    def wrapped(*a):
        out = fn(*a)
        if dtype is not None:
            out = jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "dtype") and x.dtype == jax.numpy.float32
                else x,
                out,
            )
        return out

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        out = jax.jit(wrapped)(*args)
    out = jax.block_until_ready(out)
    if jax.default_backend() != "cpu":
        out = jax.device_put(out, jax.devices()[0])
        out = jax.block_until_ready(out)
    return out
