"""StyleVectorizer — the mapping network z -> w.

Reference: `/root/reference/stylex/stylex_train.py:589-601` — L2-normalise
the latent, then ``depth`` x [EqualLinear(lr_mul), leaky_relu(0.2)]. A stack
of small dense layers: batched, it is a pure MXU workload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from stylex_tpu.models.layers import EqualLinear, leaky_relu

__all__ = ["StyleVectorizer"]


class StyleVectorizer(nn.Module):
    emb: int
    depth: int = 8
    lr_mul: float = 0.1

    @nn.compact
    def __call__(self, z):
        # torch F.normalize(dim=1): x / max(||x||, 1e-12).
        norm = jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
        x = z / norm
        for i in range(self.depth):
            x = EqualLinear(self.emb, lr_mul=self.lr_mul, name=f"fc{i}")(x)
            x = leaky_relu(x)
        return x
