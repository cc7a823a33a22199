"""Latent-space helpers: noise sampling, style mixing, truncation, slerp.

Functional, RNG-key-driven equivalents of the reference helpers at
`/root/reference/stylex/stylex_train.py:319-367`. Where the reference mixes
Python ``random``/torch RNG, everything here threads explicit ``jax.random``
keys so training schedules are reproducible and jittable.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

__all__ = [
    "latent_noise",
    "image_noise",
    "mixing_cutoff",
    "expand_styles",
    "mixed_w_styles",
    "truncate_w",
    "slerp",
    "lpips_normalize",
    "evaluate_in_chunks",
]


def evaluate_in_chunks(max_batch_size: int, fn, *args):
    """Apply ``fn`` over chunks of the batch axis and concatenate
    (`evaluate_in_chunks`, `stylex_train.py:344-350`) — host-side batching
    for memory-bound eval sweeps."""
    n = args[0].shape[0]
    outs = []
    for start in range(0, n, max_batch_size):
        outs.append(fn(*[a[start : start + max_batch_size] for a in args]))
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=0)


def latent_noise(key: jax.Array, n: int, latent_dim: int, dtype=jnp.float32) -> jax.Array:
    """z ~ N(0, I), the prior input to the mapping network (`noise`,
    `stylex_train.py:319-320`)."""
    return jax.random.normal(key, (n, latent_dim), dtype)


def image_noise(key: jax.Array, n: int, im_size: int, dtype=jnp.float32) -> jax.Array:
    """Per-pixel uniform [0,1) noise image, NHWC with one channel
    (`image_noise`, `stylex_train.py:339-340`)."""
    return jax.random.uniform(key, (n, im_size, im_size, 1), dtype)


def mixing_cutoff(key: jax.Array, num_layers: int) -> jax.Array:
    """Random style-mixing cutoff layer ``tt`` in [0, num_layers)
    (`mixed_list`, `stylex_train.py:327-329`)."""
    return jax.random.randint(key, (), 0, num_layers)


def expand_styles(w: jax.Array, num_layers: int) -> jax.Array:
    """Broadcast one w per sample to all generator layers.

    (B, latent) -> (B, num_layers, latent); the single-entry case of
    ``styles_def_to_tensor`` (`stylex_train.py:352-353`).
    """
    return jnp.broadcast_to(w[:, None, :], (w.shape[0], num_layers, w.shape[-1]))


def mixed_w_styles(w1: jax.Array, w2: jax.Array, cutoff, num_layers: int) -> jax.Array:
    """Per-layer w tensor implementing style mixing.

    Layers < ``cutoff`` take ``w1``, the rest take ``w2`` — the two-segment
    case of ``styles_def_to_tensor(noise_list + noise_list)``
    (`stylex_train.py:327-329,352-353`). ``cutoff`` may be traced; the
    select keeps shapes static for XLA.
    """
    layer_ids = jnp.arange(num_layers)[None, :, None]
    take_first = (layer_ids < cutoff).astype(w1.dtype)
    w1e = expand_styles(w1, num_layers)
    w2e = expand_styles(w2, num_layers)
    return w1e * take_first + w2e * (1.0 - take_first)


def truncate_w(w: jax.Array, w_mean: jax.Array, psi: float) -> jax.Array:
    """Truncation trick: ``psi * (w - av) + av`` (`truncate_style`,
    `stylex_train.py:1624-1646`)."""
    return psi * (w - w_mean) + w_mean


def slerp(val, low: jax.Array, high: jax.Array) -> jax.Array:
    """Spherical interpolation between latent batches (`slerp`,
    `stylex_train.py:356-362`)."""
    low_norm = low / jnp.linalg.norm(low, axis=1, keepdims=True)
    high_norm = high / jnp.linalg.norm(high, axis=1, keepdims=True)
    omega = jnp.arccos(jnp.clip(jnp.sum(low_norm * high_norm, axis=1), -1.0, 1.0))
    so = jnp.sin(omega)
    a = (jnp.sin((1.0 - val) * omega) / so)[:, None]
    b = (jnp.sin(val * omega) / so)[:, None]
    return a * low + b * high


def lpips_normalize(images: jax.Array) -> jax.Array:
    """Min-max rescale each image to [-1, 1] before the LPIPS net
    (`lpips_normalize`, `stylex_train.py:370-377`)."""
    flat = images.reshape(images.shape[0], -1)
    _max = jnp.max(flat, axis=1)[:, None, None, None]
    _min = jnp.min(flat, axis=1)[:, None, None, None]
    return (images - _min) / (_max - _min) * 2.0 - 1.0
