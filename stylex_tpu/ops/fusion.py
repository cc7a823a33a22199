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
literal everywhere; ``0`` -> force fused everywhere.
"""

from __future__ import annotations

import contextlib
import os

__all__ = ["resample_fusion_enabled", "prefer_literal_resample"]

_ENV = "STYLEX_TPU_NO_FUSED_UPCONV"


def resample_fusion_enabled() -> bool:
    """True when fusion sites should emit the fused graph (trace-time)."""
    return os.environ.get(_ENV, "") in ("", "0")


@contextlib.contextmanager
def prefer_literal_resample():
    """Default a workload to the literal resample graph (the AttFind sweep
    measurement above). An explicit ``STYLEX_TPU_NO_FUSED_UPCONV`` in the
    environment — including ``0`` to force fused — always wins."""
    if _ENV in os.environ:
        yield
        return
    os.environ[_ENV] = "1"
    try:
        yield
    finally:
        os.environ.pop(_ENV, None)
