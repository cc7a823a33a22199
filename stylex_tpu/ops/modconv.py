"""Modulated (style-conditioned) convolution — the StyleGAN2 hot op, TPU-first.

The reference implements this with a CUDA-idiomatic trick: it materialises a
per-sample weight tensor ``W * (style + 1)`` (optionally demodulated), folds
the batch into the group dimension and calls one grouped cuDNN convolution
(`/root/reference/stylex/stylex_train.py:632-667`). That shape-shifting is
hostile to the TPU: XLA cannot tile a batch-grouped conv onto the MXU
efficiently and the per-sample weight tensor burns HBM bandwidth.

Mathematically the same operator factorises into three MXU/VPU-friendly
stages, which is what we implement:

    y[b] = demod[b] * conv(x[b] * (style[b] + 1), W)

because modulation scales *input channels*, it commutes through the
convolution; demodulation is a per-(sample, out-channel) scalar

    demod[b, o] = rsqrt(sum_{kh,kw,i} (W[kh,kw,i,o] * (style[b,i]+1))^2 + eps)

computed with one small einsum (``sum(W^2)`` contracted against
``(style+1)^2``). XLA fuses the two elementwise scalings into the conv
prologue/epilogue, so the whole op is a single MXU convolution at speed of
light — no grouped conv, no per-sample weights in HBM.

All tensors are NHWC / HWIO (TPU-native layouts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["modulated_conv2d", "modulated_upsample_conv2d", "demod_scale"]


def demod_scale(weight: jax.Array, style_plus_one: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-(sample, out-channel) demodulation scale.

    Args:
      weight: (kh, kw, in_ch, out_ch) convolution kernel.
      style_plus_one: (batch, in_ch) modulation scales (already offset by +1).
      eps: numerical floor, matches the reference's ``eps=1e-8``
        (`stylex_train.py:632`).

    Returns:
      (batch, out_ch) array ``rsqrt(sum((W * s)^2) + eps)``.
    """
    # sum_{kh,kw} W^2 -> (in_ch, out_ch); contract with s^2 on the MXU.
    w_sq = jnp.sum(jnp.square(weight), axis=(0, 1))
    denom = jnp.square(style_plus_one) @ w_sq
    return lax.rsqrt(denom + eps)


def modulated_conv2d(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    demod: bool = True,
    eps: float = 1e-8,
    precision=None,
) -> jax.Array:
    """Style-modulated 2D convolution with optional weight demodulation.

    Equivalent to the reference ``Conv2DMod.forward``
    (`/root/reference/stylex/stylex_train.py:644-667`): weights are scaled by
    ``style + 1`` per input channel and, if ``demod``, rescaled so each
    output channel of the effective per-sample kernel has unit L2 norm.

    Args:
      x: (batch, H, W, in_ch) input feature map, NHWC.
      weight: (kh, kw, in_ch, out_ch) kernel, HWIO.
      style: (batch, in_ch) raw style vector (the +1 offset is applied here).
      demod: apply demodulation (True for backbone convs, False for to-RGB).
      eps: demodulation epsilon.
      precision: optional lax precision for the convolution.

    Returns:
      (batch, H, W, out_ch) output feature map (stride 1, SAME padding — the
      reference's ``_get_same_padding`` reduces to (k-1)//2 for stride 1).
    """
    s = style + 1.0
    x = x * s[:, None, None, :].astype(x.dtype)
    kh, kw = weight.shape[0], weight.shape[1]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    y = lax.conv_general_dilated(
        x,
        weight.astype(x.dtype),
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if demod:
        d = demod_scale(weight, s, eps)
        y = y * d[:, None, None, :].astype(y.dtype)
    return y


def modulated_upsample_conv2d(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    demod: bool = True,
    eps: float = 1e-8,
    precision=None,
) -> jax.Array:
    """``modulated_conv2d(upsample2x_bilinear(x), weight, style)`` without
    materializing the 4x-upsampled intermediate.

    The reference generator upsamples then convolves
    (`stylex_train.py:677-705`); since modulation scales *input channels*
    it commutes through the (spatial) upsample, demodulation is a
    per-(sample, out-channel) scalar computed from the FINE kernel exactly
    as in :func:`modulated_conv2d`, and the upsample+conv composition
    collapses into one polyphase coarse-grid conv
    (:mod:`stylex_tpu.ops.upconv`). Only the 3x3 stride-1 SAME case the
    generator uses is supported.
    """
    from stylex_tpu.ops.upconv import upsample2x_conv3x3_same

    s = style + 1.0
    x = x * s[:, None, None, :].astype(x.dtype)
    y = upsample2x_conv3x3_same(x, weight, precision=precision)
    if demod:
        d = demod_scale(weight, s, eps)
        y = y * d[:, None, None, :].astype(y.dtype)
    return y
