"""Pallas TPU kernel: fused 2x bilinear upsample (NHWC, half-pixel centers).

Torch semantics (``nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=False)``, used by ``GeneratorBlock``/``RGBBlock``,
`/root/reference/stylex/stylex_train.py:604-629,677-686`): output centers
sit at quarter-pixel offsets, so along each axis

    out[2i]   = 0.25 * x[i-1] + 0.75 * x[i]      (i-1 edge-clamped)
    out[2i+1] = 0.75 * x[i]   + 0.25 * x[i+1]    (i+1 edge-clamped)

The op is pure bandwidth (6 MACs per output element). XLA lowers
``jax.image.resize`` to an input-dilated convolution; this kernel instead
does one halo DMA per tile and writes the interleaved output directly:
rows interleave on the un-tiled dim -3, columns via the sublane reshape
trick ((rows, W, 2, C) -> (rows, 2W, C)) that Mosaic supports (the same
move the blur-downsample kernel uses in reverse).

Numerics match ``jax.image.resize(method='bilinear')`` at 2x to float
rounding; tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["upsample2x_bilinear_pallas"]


def _pick_tile(h: int, limit: int) -> int:
    tile = min(h, limit)
    while h % tile:
        tile -= 1
    return tile


def _make_kernel(tile_h: int, w: int, w_pad: int, c_tile: int):
    in_rows = tile_h + 2  # one halo row each side (edge-clamped by caller pad)

    def kernel(x_hbm, o_ref):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        ci = pl.program_id(2)
        row0 = hi * tile_h

        def body(scratch, sem):
            copy = pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(row0, in_rows), :, pl.ds(ci * c_tile, c_tile)],
                scratch,
                sem,
            )
            copy.start()
            copy.wait()
            x = scratch[:]
            a = jnp.asarray(0.25, x.dtype)
            b = jnp.asarray(0.75, x.dtype)
            prev_r = x[0:tile_h, :, :]
            cur_r = x[1 : tile_h + 1, :, :]
            next_r = x[2 : tile_h + 2, :, :]
            even_r = a * prev_r + b * cur_r  # out rows 2i
            odd_r = b * cur_r + a * next_r  # out rows 2i+1
            # interleave rows on the un-tiled dim: (tile_h, 2, W', C)
            rows = jnp.concatenate([even_r[:, None], odd_r[:, None]], axis=1)
            rows = rows.reshape(2 * tile_h, w_pad, x.shape[-1])
            # columns: input col j of the w-window lives at 1 + j (halo pad)
            prev_c = rows[:, 0:w, :]
            cur_c = rows[:, 1 : w + 1, :]
            next_c = rows[:, 2 : w + 2, :]
            even_c = a * prev_c + b * cur_c
            odd_c = b * cur_c + a * next_c
            # sublane interleave: (2T, W, 2, C) -> (2T, 2W, C)
            out = jnp.concatenate([even_c[:, :, None], odd_c[:, :, None]], axis=2)
            o_ref[0] = out.reshape(2 * tile_h, 2 * w, x.shape[-1])

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((in_rows, w_pad, c_tile), o_ref.dtype),
            sem=pltpu.SemaphoreType.DMA,
        )

    return kernel


def _upsample_call(x: jax.Array, interpret: bool) -> jax.Array:
    b, h, w, c = x.shape
    # edge-clamp halo via XLA pad (fuses into the producer)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    sublane = {4: 8, 2: 16, 1: 32}.get(jnp.dtype(x.dtype).itemsize, 8)
    w_pad = -(-(w + 2) // sublane) * sublane
    if w_pad != w + 2:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, w_pad - (w + 2)), (0, 0)))
    c_tile = c
    tile_h = _pick_tile(h, 32)
    itemsize = jnp.dtype(x.dtype).itemsize
    # input slab + 4x output tile must fit VMEM comfortably
    while (tile_h + 2 + 8 * tile_h) * w_pad * c_tile * itemsize > 6 * 2**20:
        if c_tile % 2 == 0 and c_tile > 128:
            c_tile //= 2
        elif tile_h > 1:
            tile_h = _pick_tile(h, tile_h // 2)
        else:
            break
    grid = (b, h // tile_h, c // c_tile)
    kernel = _make_kernel(tile_h, w, w_pad, c_tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 2 * tile_h, 2 * w, c_tile),
            lambda bi, hi, ci: (bi, hi, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), x.dtype),
        interpret=interpret,
    )(xp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def upsample2x_bilinear_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Fused bilinear 2x upsample, NHWC."""
    return _upsample_call(x, interpret=interpret)


# ---------------------------------------------------------------------------
# batch-tiled variant: BlockSpec-pipelined (double-buffered by pallas), for
# the generator's small-spatial/large-batch regime (AttFind sweeps)
# ---------------------------------------------------------------------------


def _make_batch_kernel(tile_b: int, h: int, w: int, w_pad: int, c: int):
    def kernel(x_ref, o_ref):
        x = x_ref[:]  # (tile_b, h+2, w_pad, c)
        a = jnp.asarray(0.25, x.dtype)
        b = jnp.asarray(0.75, x.dtype)
        prev_r = x[:, 0:h]
        cur_r = x[:, 1 : h + 1]
        next_r = x[:, 2 : h + 2]
        even_r = a * prev_r + b * cur_r
        odd_r = b * cur_r + a * next_r
        rows = jnp.concatenate([even_r[:, :, None], odd_r[:, :, None]], axis=2)
        rows = rows.reshape(tile_b, 2 * h, w_pad, c)
        prev_c = rows[:, :, 0:w]
        cur_c = rows[:, :, 1 : w + 1]
        next_c = rows[:, :, 2 : w + 2]
        even_c = a * prev_c + b * cur_c
        odd_c = b * cur_c + a * next_c
        out = jnp.concatenate([even_c[:, :, :, None], odd_c[:, :, :, None]], axis=3)
        o_ref[:] = out.reshape(tile_b, 2 * h, 2 * w, c)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def upsample2x_bilinear_pallas_batched(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Bilinear 2x upsample tiled over BATCH with pallas-managed (double-
    buffered) HBM->VMEM pipelining — the whole (H+2, W', C) image per batch
    element lives in VMEM. Right regime: small spatial, big batch."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    sublane = {4: 8, 2: 16, 1: 32}.get(jnp.dtype(x.dtype).itemsize, 8)
    w_pad = -(-(w + 2) // sublane) * sublane
    if w_pad != w + 2:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, w_pad - (w + 2)), (0, 0)))
    itemsize = jnp.dtype(x.dtype).itemsize
    per_item = ((h + 2) * w_pad + 4 * h * w) * c * itemsize
    tile_b = max(1, min(b, (4 * 2**20) // max(per_item, 1)))
    # power-of-2 divisor of b only: odd tile counts (e.g. 14 at b=616) have
    # crashed the Mosaic compiler, and pow2 tiles pack sublanes cleanly
    while b % tile_b or tile_b & (tile_b - 1):
        tile_b -= 1
    grid = (b // tile_b,)
    return pl.pallas_call(
        _make_batch_kernel(tile_b, h, w, w_pad, c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, h + 2, w_pad, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((tile_b, 2 * h, 2 * w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h, 2 * w, c), x.dtype),
        interpret=interpret,
    )(xp)
