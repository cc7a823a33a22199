"""Fused blur + stride-2 3x3 convolution (the discriminator downsampler).

The reference's ``DiscriminatorBlock`` downsample path is ``Blur()`` followed
by ``Conv2d(filters, filters, 3, padding=1, stride=2)``
(`/root/reference/stylex/stylex_train.py:733-736`). Lowered naively, the
blurred full-resolution activation makes an HBM round trip between the two
ops in every D/E forward (and its transpose in every backward). Both ops are
linear convolutions, so they collapse into ONE stride-2 convolution with the
composed 5x5 kernel ``K[t] = sum_b W[b] * B[t-b]`` (binomial taps
B = [1,2,1]/4 per axis) applied to the reflect-padded input — the same
collapse as the generator's fused entry conv (:mod:`stylex_tpu.ops.upconv`),
in the downsample direction.

Boundary semantics: the blur reflect-pads by 1 and the conv zero-pads its
(blurred) input by 1, so the composed interior formula
``z[o] = sum_t K[t] u[2o-1+t]`` (u = reflect-padded input) is exact for all
output rows/cols o >= 1 and invalid only at o = 0, where the conv's zero pad
crosses the blur boundary. The first output row/column is therefore
recomputed exactly by running the literal unfused composition on a 3-wide
input strip: a strip's leading reflect pad equals the full op's, and the two
blurred rows (cols) the o=0 output reads depend only on input rows (cols)
0..2. Verified against the unfused composition and a torch oracle in
``tests/test_ops.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from stylex_tpu.ops.blur import blur3_xla

__all__ = ["compose_blur_conv_kernel", "blur_conv3x3_down2"]

# M[t, b] = B[t - b] for the full 1-D composition of a 3-tap kernel with the
# normalized binomial blur B = [0.25, 0.5, 0.25] (symmetric, so correlation
# and convolution coincide for B).
_M = np.array(
    [
        [0.25, 0.0, 0.0],
        [0.50, 0.25, 0.0],
        [0.25, 0.50, 0.25],
        [0.0, 0.25, 0.50],
        [0.0, 0.0, 0.25],
    ]
)


def compose_blur_conv_kernel(w: jax.Array) -> jax.Array:
    """Compose a (3, 3, in_ch, out_ch) kernel with the preceding binomial
    blur into the equivalent (5, 5, in_ch, out_ch) kernel."""
    m = jnp.asarray(_M, w.dtype)
    return jnp.einsum("Ab,Cd,bdio->ACio", m, m, w)


def _conv_s2_p1(x: jax.Array, w: jax.Array) -> jax.Array:
    """Torch-style conv: stride 2, symmetric zero padding 1 (3x3 kernels)."""
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def blur_conv3x3_down2(x: jax.Array, w: jax.Array) -> jax.Array:
    """``conv3x3_stride2_pad1(blur3(x), w)`` as one fused convolution.

    Args:
      x: (B, H, W, C) with H, W even and >= 4.
      w: (3, 3, C, out_ch) fine-grid kernel (the stored parameter — composes
        on the fly so checkpoints keep the reference's 3x3 layout).

    Returns:
      (B, H//2, W//2, out_ch), equal to the unfused composition to rounding.
    """
    b, h, wd, c = x.shape
    w = w.astype(x.dtype)
    k = compose_blur_conv_kernel(w)

    u = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # One zero row/col in front aligns output o to read u[2o-1 .. 2o+3];
    # the o=0 row/col it miscomputes is overwritten below.
    up = jnp.pad(u, ((0, 0), (1, 0), (1, 0), (0, 0)))
    z = lax.conv_general_dilated(
        up,
        k,
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )

    # Exact first row / first column via the literal composition on strips.
    row0 = _conv_s2_p1(blur3_xla(x[:, 0:3, :, :]), w)[:, 0:1, :, :]
    col0 = _conv_s2_p1(blur3_xla(x[:, :, 0:3, :]), w)[:, :, 0:1, :]
    body = lax.concatenate([col0[:, 1:, :, :], z[:, 1:, 1:, :]], dimension=2)
    return lax.concatenate([row0, body], dimension=1)
