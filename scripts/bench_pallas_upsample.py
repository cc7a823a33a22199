"""Measure the Pallas 2x bilinear upsample vs XLA's ``jax.image.resize``.

Runs every upsample shape the generator actually executes (GeneratorBlock
input upsample + RGB-skip upsample, `stylex_train.py:604-629,677-686`
semantics) in the two shipping regimes:

* AttFind sweep: 64px model, large batch (chunked sweep), bf16
* training: 256px model, small batch, f32 and bf16

and prints a per-shape table for the manual-DMA kernel, the batch-pipelined
kernel, and the XLA lowering, so the dispatch gate in ``ops/blur.py`` is a
measurement, not a guess.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stylex_tpu.models.generator import generator_filters
from stylex_tpu.utils.cache import enable_persistent_cache
from stylex_tpu.utils.timing import measure_op

enable_persistent_cache()
from stylex_tpu.ops.blur import upsample2x_bilinear
from stylex_tpu.ops.pallas_upsample import (
    upsample2x_bilinear_pallas,
    upsample2x_bilinear_pallas_batched,
)


def upsample_shapes(image_size: int, batch: int):
    """(B, H, W, C) inputs fed to upsample2x in one generator forward."""
    f = generator_filters(image_size)
    init = 4
    shapes = []
    h = init
    # block i>0 upsamples its input (chan = filters[i] of the previous block's
    # output) and every block's RGB skip upsamples at 3 channels
    chans = f[1:]
    for i in range(1, len(chans)):
        shapes.append((batch, h, h, chans[i - 1]))
        shapes.append((batch, h, h, 3))  # rgb skip from previous block
        h *= 2
    return shapes


def timeit(fn, x):
    bytes_moved = (x.size + 4 * x.size) * x.dtype.itemsize
    t = measure_op(fn, [x], bytes_moved=bytes_moved)
    return t.seconds, (t.eff_bandwidth or 0) / 1e9


def main():
    variants = {
        "xla": upsample2x_bilinear,
        "pallas_dma": upsample2x_bilinear_pallas,
        "pallas_batch": upsample2x_bilinear_pallas_batched,
    }
    configs = [
        ("attfind64 bf16 b616", 64, 616, jnp.bfloat16),
        ("train256 f32 b8", 256, 8, jnp.float32),
        ("train256 bf16 b8", 256, 8, jnp.bfloat16),
    ]
    for label, size, batch, dtype in configs:
        print(f"\n== {label} ==")
        print(f"{'shape':>24} | " + " | ".join(f"{k:>18}" for k in variants))
        for shape in upsample_shapes(size, batch):
            x = jax.random.normal(jax.random.PRNGKey(0), shape, dtype)
            row = []
            for name, fn in variants.items():
                try:
                    dt, gbps = timeit(fn, x)
                    row.append(f"{dt * 1e6:9.1f}us {gbps:5.0f}GB/s")
                except Exception as e:  # noqa: BLE001
                    row.append(f"FAIL {type(e).__name__[:12]}")
            print(f"{str(shape):>24} | " + " | ".join(f"{r:>18}" for r in row))


if __name__ == "__main__":
    main()
