"""Fused bilinear-2x-upsample + 3x3 convolution (polyphase, exact).

The generator's block entry is ``conv3x3(upsample2x_bilinear(x))``
(`/root/reference/stylex/stylex_train.py:677-705`: ``nn.Upsample`` followed
by ``Conv2DMod``). Lowered naively, XLA must materialize the 4x-upsampled
activation in HBM (and ``jax.image.resize`` lowers the bilinear taps as
gathers) before the conv reads it back — at the AttFind sweep's shapes that
intermediate round-trip is the single most expensive stage of the whole
pipeline (docs/ROOFLINE.md).

Because both ops are linear convolutions, the composition collapses into
ONE convolution on the COARSE grid: for each of the 4 output phases
(py, px) the half-pixel bilinear taps ([0.25, 0.75] / [0.75, 0.25])
compose with the 3x3 kernel into a 3x3 coarse kernel. Running all four
phases as a single conv with ``4*out_ch`` output channels keeps the MXU
contraction large, and a depth-to-space reshuffle restores the fine grid.
Same FLOPs, no fine-grid intermediate — the same trick StyleGAN2's own
CUDA kernels use (upfirdn2d folded into a strided transposed conv), done
the XLA way.

Boundary exactness: the polyphase interior formula assumes clamp-free
bilinear taps and in-bounds coarse neighbours, which holds for fine rows /
cols ``2 .. 2N-3``. The 2-pixel fine border is recomputed exactly by
running the reference composition (resize + conv) on 3-wide coarse strips:
a strip's top/bottom (left/right) clamp and SAME-zero-pad match the full
op's, and its 2 outermost fine rows (cols) depend only on coarse rows
(cols) the strip contains — so the pasted result equals
``conv3x3_same(upsample2x_bilinear(x))`` everywhere, to reassociation
rounding. Verified against the unfused composition in
``tests/test_ops.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["compose_upsample2x_kernel", "upsample2x_conv3x3_same"]

# Per-axis composition matrices M[phase][fine_tap u, coarse_tap a]: the
# coefficient with which fine-kernel tap w[u] reaches coarse neighbour
# x[i + a - 1] for output phase 0 (even, fine 2i) / 1 (odd, fine 2i+1),
# derived from half-pixel bilinear (torch align_corners=False):
#   y[2i]   = 0.25 x[i-1] + 0.75 x[i]
#   y[2i+1] = 0.75 x[i]   + 0.25 x[i+1]
_M = (
    np.array([[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]]),
    np.array([[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]]),
)


def compose_upsample2x_kernel(w: jax.Array) -> jax.Array:
    """Compose a (3, 3, in_ch, out_ch) kernel with the bilinear-2x taps.

    Returns a (3, 3, in_ch, 4*out_ch) coarse-grid kernel whose output
    channels are laid out as (py, px, out_ch) so that a depth-to-space
    reshape of the conv result reproduces the fine grid.
    """
    phases = []
    for py in (0, 1):
        for px in (0, 1):
            m_y = jnp.asarray(_M[py], w.dtype)
            m_x = jnp.asarray(_M[px], w.dtype)
            # W*[a, b, i, o] = sum_{u,v} M[py][u, a] M[px][v, b] w[u, v, i, o]
            phases.append(jnp.einsum("ua,vb,uvio->abio", m_y, m_x, w))
    stacked = jnp.stack(phases, axis=-2)  # (3, 3, in, 4, out)
    kh, kw, cin, _, cout = stacked.shape
    return stacked.reshape(kh, kw, cin, 4 * cout)


def _conv_same(x: jax.Array, w: jax.Array, precision) -> jax.Array:
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


def _upsample2x_explicit(x: jax.Array) -> jax.Array:
    """Half-pixel bilinear 2x as explicit weighted-row interleaving.

    Equals ``jax.image.resize(..., 'bilinear')`` for the exact-2x case but
    lowers as elementwise adds + concats instead of gathers — the gathers
    dominate on thin border strips.
    """
    q1, q3 = jnp.asarray(0.25, x.dtype), jnp.asarray(0.75, x.dtype)

    def axis_up(t, axis):
        n = t.shape[axis]
        first = lax.slice_in_dim(t, 0, 1, axis=axis)
        last = lax.slice_in_dim(t, n - 1, n, axis=axis)
        lo = jnp.concatenate([first, lax.slice_in_dim(t, 0, n - 1, axis=axis)], axis)
        hi = jnp.concatenate([lax.slice_in_dim(t, 1, n, axis=axis), last], axis)
        even = q1 * lo + q3 * t
        odd = q3 * t + q1 * hi
        y = jnp.stack([even, odd], axis=axis + 1)
        shape = list(t.shape)
        shape[axis] = 2 * n
        return y.reshape(shape)

    return axis_up(axis_up(x, 1), 2)


def _reference_composition(x: jax.Array, w: jax.Array, precision) -> jax.Array:
    """The unfused op: bilinear 2x (half-pixel, edge clamp) then conv SAME."""
    return _conv_same(_upsample2x_explicit(x), w, precision)


def upsample2x_conv3x3_same(x: jax.Array, w: jax.Array, precision=None) -> jax.Array:
    """``conv3x3_same(upsample2x_bilinear(x), w)`` without the fine-grid
    intermediate.

    Args:
      x: (batch, H, W, in_ch) NHWC feature map, H, W >= 3.
      w: (3, 3, in_ch, out_ch) HWIO kernel (the FINE-grid kernel; the
        coarse composition is derived here and is linear in ``w``, so
        gradients flow to the original parameterisation).
      precision: optional lax precision for the convolutions.

    Returns:
      (batch, 2H, 2W, out_ch) feature map.
    """
    b, h, wd, _ = x.shape
    if h < 3 or wd < 3:
        return _reference_composition(x, w, precision)
    cout = w.shape[-1]

    wstar = compose_upsample2x_kernel(w)
    z = _conv_same(x, wstar, precision)  # (b, h, wd, 4*cout)
    z = z.reshape(b, h, wd, 2, 2, cout)
    z = z.transpose(0, 1, 3, 2, 4, 5)  # (b, h, py, wd, px, cout)
    z = z.reshape(b, 2 * h, 2 * wd, cout)

    # exact 2-pixel fine borders from 3-wide coarse strips (see module doc).
    # In-place updates, not concats: a concat materializes the whole output
    # an extra time per axis, which costs more than the fusion saves.
    top = _reference_composition(x[:, :3], w, precision)[:, :2]
    bot = _reference_composition(x[:, -3:], w, precision)[:, -2:]
    z = lax.dynamic_update_slice_in_dim(z, top, 0, axis=1)
    z = lax.dynamic_update_slice_in_dim(z, bot, 2 * h - 2, axis=1)
    left = _reference_composition(x[:, :, :3], w, precision)[:, :, :2]
    right = _reference_composition(x[:, :, -3:], w, precision)[:, :, -2:]
    z = lax.dynamic_update_slice_in_dim(z, left, 0, axis=2)
    z = lax.dynamic_update_slice_in_dim(z, right, 2 * wd - 2, axis=2)
    return z
