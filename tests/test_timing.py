"""The slope-timing protocol (utils/timing.py) must produce sane numbers.

The protocol exists because the TPU relay memoizes repeated executions
and acks before completion (see the module docstring); on CPU those
hazards are absent, but the chained fori_loop must still (a) really run
the op, (b) report a positive per-call time, and (c) trip the roofline
guard when fed an impossible bytes_moved claim.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stylex_tpu.ops.blur import blur3_xla
from stylex_tpu.utils.timing import measure_op


def test_measure_op_positive_and_stable():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 16, 8)), jnp.float32)
    t = measure_op(blur3_xla, [x], n_pair=(2, 8), repeats=2)
    assert t.seconds > 0
    assert t.eff_bandwidth is None


def test_measure_op_roofline_guard():
    x = jnp.ones((2, 4, 4, 4), jnp.float32)
    with pytest.raises(RuntimeError, match="roofline"):
        # claim the tiny op moved a petabyte — the guard must fire
        measure_op(lambda a: a + 1, [x], n_pair=(2, 8), repeats=2, bytes_moved=10**15)
