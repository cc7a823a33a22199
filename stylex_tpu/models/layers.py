"""Shared flax building-block layers with reference-matching initialisation.

The reference initialises every ``nn.Conv2d``/``nn.Linear`` weight with
kaiming-normal (fan-in, leaky-relu gain — `stylex_train.py:974-978`) while
biases keep torch's default ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``;
``EqualLinear`` keeps a unit-normal weight and zero bias scaled by ``lr_mul``
at call time (`stylex_train.py:576-586`). These layers reproduce that
numerology in NHWC/HWIO layouts.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax
from stylex_tpu.ops.fusion import resample_fusion_enabled

__all__ = [
    "kaiming_normal_leaky",
    "torch_bias_uniform",
    "leaky_relu",
    "DenseTorch",
    "ConvTorch",
    "EqualLinear",
    "ChanNorm",
    "LinearAttention",
    "AttnAndFF",
]


def kaiming_normal_leaky():
    """torch ``kaiming_normal_(a=0, mode='fan_in', nonlinearity='leaky_relu')``:
    std = sqrt(2 / fan_in), untruncated normal."""
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def torch_bias_uniform(fan_in: int):
    """torch's default Linear/Conv bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    """The reference's ubiquitous ``leaky_relu(0.2)`` (`stylex_train.py:340-341`)."""
    return jnp.where(x >= 0, x, x * negative_slope)


class DenseTorch(nn.Module):
    """Linear layer matching torch init (kaiming-normal weight, uniform bias)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or kaiming_normal_leaky(),
            (in_features, self.features),
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init or torch_bias_uniform(in_features), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y


class ConvTorch(nn.Module):
    """2-D convolution with torch-style explicit padding and init, NHWC/HWIO.

    Explicit symmetric padding replicates torch's ``padding=p`` semantics for
    strided convs, which differ from XLA's asymmetric 'SAME'.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: Optional[Callable] = None
    # Apply the 3-tap binomial blur BEFORE the conv, fused into one stride-2
    # convolution with the composed 5x5 kernel (the discriminator downsample
    # pair, `stylex_train.py:733-736`; see stylex_tpu.ops.downconv). The
    # stored parameter keeps the reference's (3,3,I,O) layout — composition
    # happens on the fly — so checkpoints and converters are unchanged.
    pre_blur: bool = False

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init or kaiming_normal_leaky(),
            (k, k, in_features // self.feature_group_count, self.features),
        )
        if self.pre_blur:
            if not (k == 3 and self.stride == 2 and self.padding == 1 and self.feature_group_count == 1):
                raise ValueError("pre_blur composes only with 3x3 / stride 2 / padding 1 convs")
            from stylex_tpu.ops.blur import blur3
            from stylex_tpu.ops.downconv import blur_conv3x3_down2

            # Unlike the generator's polyphase upconv (same FLOPs), the
            # composed 5x5 kernel costs (25-9)/9 extra MXU work for the
            # saved full-res HBM round trip (2*H*W*cin accesses). Per
            # static block shape, fusing wins iff
            #   2*H*W*cin*dsize/HBM > 2*16*cin*cout_pad*(H/2)*(W/2)/MXU
            # -> cout_pad < 4*dsize*MXU/(16*HBM), which on v5e (197T bf16 /
            # 98.5T f32, 819 GB/s) is ~240 both ways -> fuse when the
            # 128-lane-padded out-channel count is 128, i.e. cout <= 128
            # (the high-res low-channel D/E blocks, where resampling bytes
            # dominate; the deep 256/512-channel blocks stay unfused and
            # MXU-lean).
            fused_ok = (
                x.shape[1] >= 4
                and x.shape[2] >= 4
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
                and self.features <= 128
                and resample_fusion_enabled()
            )
            if fused_ok:
                y = blur_conv3x3_down2(x, kernel)
            else:
                x = blur3(x)
                y = lax.conv_general_dilated(
                    x,
                    kernel.astype(x.dtype),
                    window_strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            if self.use_bias:
                fan_in = in_features * k * k
                bias = self.param("bias", torch_bias_uniform(fan_in), (self.features,))
                y = y + bias.astype(y.dtype)
            return y
        y = lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.feature_group_count,
        )
        if self.use_bias:
            fan_in = (in_features // self.feature_group_count) * k * k
            bias = self.param("bias", torch_bias_uniform(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class EqualLinear(nn.Module):
    """Equalized-LR linear: weight ~ N(0,1), bias zero, both scaled by
    ``lr_mul`` in the forward pass (`EqualLinear`, `stylex_train.py:576-586`)."""

    features: int
    lr_mul: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev=1.0), (x.shape[-1], self.features)
        )
        y = x @ (kernel * self.lr_mul).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + (bias * self.lr_mul).astype(y.dtype)
        return y


class ChanNorm(nn.Module):
    """Channel-wise norm with biased variance (`ChanNorm`,
    `stylex_train.py:107-118`). NHWC: normalises the last axis."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        g = self.param("g", nn.initializers.ones_init(), (dim,))
        b = self.param("b", nn.initializers.zeros_init(), (dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / (jnp.sqrt(var) + self.eps) * g + b


class LinearAttention(nn.Module):
    """Efficient linear attention over feature maps (`LinearAttention`,
    `stylex_train.py:171-198`).

    q is softmaxed over the feature axis, k over the token axis; the context
    matrix ``k^T v`` is tiny (dim_head x dim_head) so both einsums are pure
    MXU matmuls regardless of spatial size.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, fmap):
        b, h, w, c = fmap.shape
        inner = self.dim_head * self.heads
        scale = self.dim_head**-0.5

        q = ConvTorch(inner, 1, use_bias=False, name="to_q")(fmap)
        # Depthwise 3x3 then pointwise 1x1, both bias-free (`DepthWiseConv2d`).
        kv = ConvTorch(c, 3, padding=1, use_bias=False, feature_group_count=c, name="to_kv_depth")(fmap)
        kv = ConvTorch(inner * 2, 1, use_bias=False, name="to_kv_point")(kv)
        k, v = jnp.split(kv, 2, axis=-1)

        def to_heads(t):
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(to_heads, (q, k, v))  # (b, heads, n, d)
        q = jax.nn.softmax(q, axis=-1) * scale
        k = jax.nn.softmax(k, axis=-2)
        context = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, context)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, inner)
        out = jax.nn.gelu(out, approximate=False)
        return ConvTorch(self.dim, 1, name="to_out")(out)


class AttnAndFF(nn.Module):
    """Residual(prenorm(linear-attn)) + residual(prenorm(conv FF))
    (`attn_and_ff`, `stylex_train.py:203-206`)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = x + LinearAttention(self.dim, name="attn")(ChanNorm(name="norm1")(x))
        h = ChanNorm(name="norm2")(x)
        h = ConvTorch(self.dim * 2, 1, name="ff1")(h)
        h = leaky_relu(h)
        h = ConvTorch(self.dim, 1, name="ff2")(h)
        return x + h
