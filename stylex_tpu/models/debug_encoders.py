"""Small debug encoders (flax), mirroring
`/root/reference/stylex/debug_encoders.py`.

Selected by ``ModelConfig.encoder_class`` via :data:`encoder_registry`, the
same lookup the reference does through ``encoder_dict``
(`debug_encoders.py:123-129`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from stylex_tpu.models.layers import ConvTorch, DenseTorch, leaky_relu

__all__ = ["DebugEncoder", "PhillipEncoder", "PhillipEncoder64", "encoder_registry"]

_IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


class DebugEncoder(nn.Module):
    """Three strided convs + linear -> 512, with ImageNet normalisation baked
    into the forward pass (`DebugEncoder`, `debug_encoders.py:84-116`)."""

    latent_size: int = 512

    @nn.compact
    def __call__(self, x, probabilities=None):
        x = (x - _IMAGENET_MEAN.astype(x.dtype)) / _IMAGENET_STD.astype(x.dtype)
        for i in range(3):
            x = ConvTorch(32, 3, stride=2, padding=1, name=f"conv{i + 1}")(x)
            x = leaky_relu(x)
        x = x.reshape(x.shape[0], -1)
        x = DenseTorch(self.latent_size, name="linear1")(x)
        return leaky_relu(x)


class PhillipEncoder(nn.Module):
    """CIFAR-style conv encoder (`PhillipEncoder`, `debug_encoders.py:47-81`)."""

    base_channel_size: int = 32
    latent_dim: int = 512

    @nn.compact
    def __call__(self, x, probabilities=None):
        c = self.base_channel_size
        plan = [(c, 2), (c, 1), (2 * c, 2), (2 * c, 1), (2 * c, 2)]
        for i, (ch, stride) in enumerate(plan):
            x = ConvTorch(ch, 3, stride=stride, padding=1, name=f"conv{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = x.reshape(x.shape[0], -1)
        return DenseTorch(self.latent_dim, name="fc")(x)


class PhillipEncoder64(nn.Module):
    """Deeper variant for 64px inputs (`PhillipEncoder64`,
    `debug_encoders.py:9-44`)."""

    base_channel_size: int = 32
    latent_dim: int = 512

    @nn.compact
    def __call__(self, x, probabilities=None):
        c = self.base_channel_size
        plan = [(c, 2), (c, 2), (2 * c, 1), (4 * c, 2), (4 * c, 1), (4 * c, 2)]
        for i, (ch, stride) in enumerate(plan):
            x = ConvTorch(ch, 3, stride=stride, padding=1, name=f"conv{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = x.reshape(x.shape[0], -1)
        return DenseTorch(self.latent_dim, name="fc")(x)


encoder_registry = {
    "DebugEncoder": DebugEncoder,
    "PhillipEncoder": PhillipEncoder,
    "PhillipEncoder64": PhillipEncoder64,
}
