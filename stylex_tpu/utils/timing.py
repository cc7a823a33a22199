"""Robust on-device timing for tunneled/remote TPU platforms.

On a relayed TPU (this container's ``axon`` PJRT plugin) the naive
protocols break:

* ``block_until_ready`` can return before execution completes, and
  independent never-fetched results may never execute at all — a hot
  ``for`` loop over one input measures dispatch rate, not compute
  (observed: a ~900us blur "measured" at 13us/call);
* repeated executions of one (executable, inputs) pair can be served
  from a result cache;
* per-call dispatch latency through the relay is large and noisy
  (hundreds of us to ms), drowning sub-ms kernels;
* host transfers ride the relay at ~10 MB/s — only scalar fetches are
  safe inside a timed region.

``measure_op`` therefore times a *device-side scalar-chained loop*: one
``lax.fori_loop`` executable runs the op ``n`` times, each iteration's
input perturbed by a carrier scalar and the carrier updated from one
element of the iteration's output. The data dependence makes every
iteration really execute, in order, on distinct values — nothing to
cache, nothing to elide, and only ONE dispatch + ONE scalar fetch per
measurement. The reported cost is the slope ``(T(n2) - T(n1)) /
(n2 - n1)`` (fixed dispatch/fetch costs cancel), median over repeats
with distinct carrier seeds. When the caller supplies ``bytes_moved``,
the implied bandwidth is checked against the HBM roofline: a
superluminal result raises instead of reporting fiction.
"""

from __future__ import annotations

import functools
import statistics
import time
from typing import Callable, Sequence

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["measure_op", "measure_chained", "OpTiming"]

# v5e HBM ~819 GB/s; slack for on-chip cache effects on small arrays.
_HBM_PEAK_BYTES_PER_S = 0.82e12
_ROOFLINE_SLACK = 2.0


@dataclass
class OpTiming:
    seconds: float                 # per-call seconds (median slope)
    spread: float                  # max-min across repeats, seconds
    eff_bandwidth: float | None    # bytes_moved / seconds, if provided

    def __str__(self) -> str:  # pragma: no cover - display only
        s = f"{self.seconds * 1e6:9.1f}us (±{self.spread * 1e6:.0f})"
        if self.eff_bandwidth is not None:
            s += f" {self.eff_bandwidth / 1e9:5.0f}GB/s"
        return s


def _make_looped(fn: Callable, idx: int):
    """One executable: run ``fn`` ``n`` times, scalar-chained.

    ``n`` is a TRACED scalar operand, not a static constant: the
    ``fori_loop`` lowers to one ``while`` program that serves every loop
    length. On this 1-vCPU host behind a remote-compile relay that matters
    a lot — the slope protocol needs two lengths, and a static ``n`` would
    compile the full sweep/train program twice (the round-2 bench timeout
    was mostly duplicated cold compiles of near-identical executables).
    """

    @functools.partial(jax.jit, static_argnums=())
    def looped(n, s0, *args):
        base = args[idx]
        eps = jnp.asarray(
            1e-6 if jnp.issubdtype(base.dtype, jnp.floating) else 1, base.dtype
        )

        def body(_, s):
            a = list(args)
            a[idx] = base + s.astype(base.dtype) * eps
            out = fn(*a)
            # The carrier must consume EVERY output element NONLINEARLY:
            # probing one element lets XLA push the slice through
            # pad/elementwise/conv chains and dead-code-eliminate the rest
            # of the op (observed: the XLA blur "ran" at 1.4 TB/s because
            # only one output pixel was computed), and a plain sum of a
            # LINEAR op's output can be folded into a reweighting of the
            # input. sum(x^2) resists both; it adds one read pass over the
            # output — identical for every variant under comparison.
            probe = sum(
                jnp.sum(jnp.square(leaf.astype(jnp.float32)))
                for leaf in jax.tree.leaves(out)
            )
            return s + 1.0 + jnp.where(jnp.isnan(probe), 1e-3, 0.0)

        return lax.fori_loop(0, jnp.asarray(n, jnp.int32), body, s0)

    return looped


def measure_op(
    fn: Callable,
    args: Sequence,
    *,
    n_pair: tuple[int, int] | None = None,
    repeats: int = 3,
    bytes_moved: int | None = None,
    target_seconds: float = 0.4,
) -> OpTiming:
    """Per-call device latency of ``fn(*args)`` via a chained on-device loop.

    The first array argument is shifted per iteration by the carrier
    scalar (distinct inputs, nothing cacheable); ``fn`` must be pure.
    Without an explicit ``n_pair`` the loop length is calibrated so the
    long run's compute (~``target_seconds``) dominates the ~30ms relay
    round-trip that otherwise drowns sub-ms kernels.
    """
    args = list(args)
    idx = next(i for i, a in enumerate(args) if hasattr(a, "dtype"))

    looped = _make_looped(fn, idx)  # ONE executable for every loop length

    if n_pair is None:
        float(looped(16, jnp.float32(0.789), *args))  # compile + warm
        t0 = time.perf_counter()
        float(looped(16, jnp.float32(0.987), *args))
        t16 = time.perf_counter() - t0
        est = max((t16 - 0.030) / 16, 2e-6)  # ~30ms fixed relay cost
        n2 = int(min(max(target_seconds / est, 32), 4096))
        n_pair = (n2 // 4, n2)

    n1, n2 = n_pair
    # compile + warm (both lengths run the same while-loop program)
    float(looped(n1, jnp.float32(0.123), *args))
    float(looped(n2, jnp.float32(0.456), *args))

    slopes = []
    for r in range(repeats):
        ts = []
        for n in (n1, n2):
            s0 = jnp.float32(1.0 + 0.01 * r + 0.001 * n)  # unique seed per run
            t0 = time.perf_counter()
            float(looped(n, s0, *args))  # one dispatch, one scalar fetch
            ts.append(time.perf_counter() - t0)
        slopes.append(max((ts[1] - ts[0]) / (n2 - n1), 1e-12))
    per = statistics.median(slopes)
    spread = max(slopes) - min(slopes)

    eff = None
    if bytes_moved is not None:
        eff = bytes_moved / per
        if eff > _HBM_PEAK_BYTES_PER_S * _ROOFLINE_SLACK:
            raise RuntimeError(
                f"timing artifact: effective bandwidth {eff / 1e9:.0f} GB/s exceeds the "
                f"HBM roofline — completion was not actually awaited"
            )
    return OpTiming(per, spread, eff)


def measure_chained(
    fn: Callable,
    carry0,
    *,
    n_pair: tuple[int, int] = (2, 8),
    repeats: int = 3,
) -> OpTiming:
    """Per-call latency of a carry -> carry function (e.g. a train step).

    ``fn(i, carry) -> carry`` is iterated inside one ``lax.fori_loop``
    executable — the carry dependence forces every iteration to really
    run. Across outer calls the carry chains too (call N+1 consumes call
    N's output), so no two dispatches have identical inputs for the relay
    to memoize. Slope-timed like :func:`measure_op`.
    """

    @jax.jit
    def looped(n, c):
        # traced trip count: one while-loop executable serves both lengths
        return lax.fori_loop(0, jnp.asarray(n, jnp.int32), fn, c)

    n1, n2 = n_pair

    def force(c) -> None:
        leaf = next(x for x in jax.tree.leaves(c) if hasattr(x, "dtype"))
        float(leaf.ravel()[:1].astype(jnp.float32).sum())

    c = looped(n1, carry0)
    force(c)
    c = looped(n2, c)
    force(c)

    slopes = []
    for _ in range(repeats):
        ts = []
        for n in (n1, n2):
            t0 = time.perf_counter()
            c = looped(n, c)
            force(c)
            ts.append(time.perf_counter() - t0)
        slopes.append(max((ts[1] - ts[0]) / (n2 - n1), 1e-12))
    return OpTiming(statistics.median(slopes), max(slopes) - min(slopes), None)
