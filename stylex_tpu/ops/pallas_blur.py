"""Pallas TPU kernel: fused 3-tap binomial blur (and blur+2x-downsample).

The blur is pure bandwidth: 9 MACs per element on a [1,2,1]⊗[1,2,1]/16
filter. Left to XLA it can become two 1-D convolutions with an HBM
round-trip between them when fusion misses; this kernel does one HBM read +
one write per tile, computing both separable passes in VMEM.

Blocking: the input is reflect-padded by 1 in XLA (cheap, fuses into the
producer) and stays in HBM; each grid step DMAs an overlapping
(TILE_H + 2-halo) x full-W x channel-chunk slab into VMEM scratch — halo
tiles overlap, which BlockSpec (block-unit index maps) cannot express, so
the copy is explicit. Output tiles are disjoint and written through a
normal VMEM BlockSpec. The downsample variant emits every second row/column
so the full-resolution blur never materialises (the discriminator's
blur+stride-2 prologue, `/root/reference/stylex/stylex_train.py:733-736`).

Numerics match :func:`stylex_tpu.ops.blur.blur3` exactly (same taps, same
reflect padding) — tested in tests/test_pallas.py (interpret mode on CPU,
compiled opportunistically on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blur3_pallas", "blur3_downsample2x_pallas"]


def _pick_tile(h: int, limit: int) -> int:
    tile = min(h, limit)
    while h % tile:
        tile -= 1
    return tile


def _make_blur_kernel(tile_h: int, w: int, w_pad: int, c_tile: int, down: bool):
    in_rows = (2 * tile_h if down else tile_h) + 2

    def kernel(x_hbm, o_ref):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        ci = pl.program_id(2)
        row0 = hi * (2 * tile_h if down else tile_h)

        def body(scratch, sem):
            copy = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(row0, in_rows), :, pl.ds(ci * c_tile, c_tile)],
                scratch,
                sem,
            )
            copy.start()
            copy.wait()
            x = scratch[:]
            rows = in_rows - 2
            # taps in the compute dtype — python-float scaling would promote
            # bf16 lanes to f32 mid-kernel
            q = jnp.asarray(0.25, x.dtype)
            half = jnp.asarray(0.5, x.dtype)
            v = q * x[0:rows, :, :] + half * x[1 : rows + 1, :, :] + q * x[2 : rows + 2, :, :]
            h = q * v[:, 0:w, :] + half * v[:, 1 : w + 1, :] + q * v[:, 2 : w + 2, :]
            if down:
                # 2x decimation; strided slices lower as (unsupported 3-D)
                # gathers in Mosaic, so select via reshape + scalar index.
                h4 = h.reshape(rows // 2, 2, w // 2, 2, h.shape[-1])
                o_ref[0] = h4[:, 0, :, 0, :]
            else:
                o_ref[0] = h

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((in_rows, w_pad, c_tile), o_ref.dtype),
            sem=pltpu.SemaphoreType.DMA,
        )

    return kernel


def _blur_call(x: jax.Array, down: bool, interpret: bool) -> jax.Array:
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # Mosaic DMA slices must be sublane-aligned along the W dim
    # (8 for 4-byte, 16 for 2-byte, 32 for 1-byte dtypes).
    sublane = {4: 8, 2: 16, 1: 32}.get(jnp.dtype(x.dtype).itemsize, 8)
    w_pad = -(-(w + 2) // sublane) * sublane
    if w_pad != w + 2:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, w_pad - (w + 2)), (0, 0)))
    out_h = h // 2 if down else h
    out_w = w // 2 if down else w
    # keep the VMEM slab under ~4 MB
    c_tile = c
    tile_h = _pick_tile(out_h, 64)
    itemsize = jnp.dtype(x.dtype).itemsize
    while ((2 * tile_h if down else tile_h) + 2) * w_pad * c_tile * itemsize > 4 * 2**20:
        if c_tile % 2 == 0 and c_tile > 128:
            c_tile //= 2
        elif tile_h > 8:
            tile_h = _pick_tile(out_h, tile_h // 2)
        else:
            break
    grid = (b, out_h // tile_h, c // c_tile)
    kernel = _make_blur_kernel(tile_h, w, w_pad, c_tile, down)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, out_w, c_tile),
            lambda bi, hi, ci: (bi, hi, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
        interpret=interpret,
    )(xp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur3_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Reflect-padded binomial blur, NHWC, one fused Pallas pass."""
    return _blur_call(x, down=False, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur3_downsample2x_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused blur + 2x decimation."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0
    return _blur_call(x, down=True, interpret=interpret)
