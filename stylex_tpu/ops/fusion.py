"""Resampler-fusion policy switch.

The polyphase resampler fusions (ops/upconv.py, ops/blur.py,
ops/downconv.py) are exact-to-rounding graph rewrites whose *speed* is
workload-dependent, so they are gated by measurement, per workload
(docs/ROOFLINE.md):

* **training step** (fwd+bwd, both phases): fused wins — interleaved A/B
  on the v5e measured 44.4 ms fused vs 48.8 ms literal at the 64px
  reference config (r4).
* **AttFind sweep** (forward-only generator+classifier at chunk 616):
  the LITERAL graph wins — 8.3 vs 10.6 ms/chunk (~26%), reproduced in
  back-to-back interleaved runs (r4; the r3 "+14% fused" estimate came
  from cross-day comparisons the A/B has since overruled).

``STYLEX_TPU_NO_FUSED_UPCONV`` is read at trace time at every fusion
site: unset -> the workload default; any value except ``0`` -> force
literal everywhere; ``0`` -> force fused everywhere. (Before r4, ``=0``
meant "disable fusion" like any other value — a one-time warning flags
the flipped meaning for old scripts.)

The per-workload default is a :mod:`contextvars` flag, NOT an environment
mutation (ADVICE r4): ``os.environ`` writes are process-global and
thread-unsafe — concurrent in-process tracing (e.g. a training eval while
an AttFind sweep runs) could silently get the wrong graph. A contextvar is
per-thread/task; each sweep builder is a fresh closure, so its jit cache
is traced exactly once, inside the context that created it.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
import warnings

__all__ = ["resample_fusion_enabled", "prefer_literal_resample"]

_ENV = "STYLEX_TPU_NO_FUSED_UPCONV"

# workload default: False -> fused (training); prefer_literal_resample()
# flips it for forward-only sweep tracing
_PREFER_LITERAL = contextvars.ContextVar("stylex_prefer_literal_resample", default=False)

_warned_zero = False


def resample_fusion_enabled() -> bool:
    """True when fusion sites should emit the fused graph (trace-time).

    An explicit ``STYLEX_TPU_NO_FUSED_UPCONV`` always wins over the
    workload default: ``0`` force-enables fusion, anything else forces
    the literal graph.
    """
    env = os.environ.get(_ENV)
    if env is not None:
        if env == "0":
            global _warned_zero
            if not _warned_zero:
                _warned_zero = True
                warnings.warn(
                    f"{_ENV}=0 now FORCE-ENABLES resampler fusion (tri-state "
                    "policy since r4); before r4 any non-empty value, "
                    "including 0, disabled it. Unset the variable for the "
                    "per-workload default, or set it to 1 to force the "
                    "literal graph.",
                    stacklevel=2,
                )
            return True
        return False
    return not _PREFER_LITERAL.get()


@contextlib.contextmanager
def prefer_literal_resample():
    """Default the enclosed tracing to the literal resample graph (the
    AttFind sweep measurement above). An explicit
    ``STYLEX_TPU_NO_FUSED_UPCONV`` in the environment — including ``0`` to
    force fused — always wins (checked inside
    :func:`resample_fusion_enabled`, so nothing here mutates the
    environment)."""
    token = _PREFER_LITERAL.set(True)
    try:
        yield
    finally:
        _PREFER_LITERAL.reset(token)
