"""Contrastive discriminator regularisation (the reference's ``cl_reg``).

The reference pulls in the external ``contrastive_learner`` package and
hooks the D trunk's 'flatten' layer (`/root/reference/stylex/
stylex_train.py:944-951`); the scheme is SimCLR: two augmented views of the
same images should have matching D features. Implemented here as NT-Xent on
L2-normalised trunk features with key-driven view augmentation — no torch
dependency, fully jittable.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from stylex_tpu.ops.diffaug import diff_augment, random_hflip

__all__ = ["nt_xent_loss", "contrastive_views", "contrastive_d_loss"]


def nt_xent_loss(h1: jax.Array, h2: jax.Array, temperature: float = 0.1) -> jax.Array:
    """Normalized-temperature cross entropy between two view batches."""
    z1 = h1 / jnp.linalg.norm(h1, axis=-1, keepdims=True)
    z2 = h2 / jnp.linalg.norm(h2, axis=-1, keepdims=True)
    b = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)  # (2B, D)
    sim = (z @ z.T) / temperature
    sim = sim - 1e9 * jnp.eye(2 * b)  # mask self-similarity
    targets = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    return jnp.mean(-jax.nn.log_softmax(sim, axis=-1)[jnp.arange(2 * b), targets])


def contrastive_views(key: jax.Array, images: jax.Array,
                      types: Sequence[str] = ("translation", "cutout")):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    v1 = diff_augment(k1, random_hflip(k2, images, 0.5), types)
    v2 = diff_augment(k3, random_hflip(k4, images, 0.5), types)
    return v1, v2


def contrastive_d_loss(
    feature_fn: Callable[[jax.Array], jax.Array],
    key: jax.Array,
    images: jax.Array,
    temperature: float = 0.1,
) -> jax.Array:
    """SimCLR loss over D trunk features of two augmented views."""
    v1, v2 = contrastive_views(key, images)
    return nt_xent_loss(feature_fn(v1), feature_fn(v2), temperature)
