"""DiffAugment — differentiable GAN augmentations as pure, key-driven ops.

Functional NHWC re-design of `/root/reference/stylex/diff_augment.py`: every
augmentation takes an explicit ``jax.random`` key, is fully vectorised over
the batch (the reference's ``rand_offset`` loops per-image in Python), and is
jittable so the whole pipeline fuses into the discriminator step. Semantics
match the reference:

* ``brightness``/``saturation``/``contrast`` (+ ``light`` variants) with the
  same scale factors (`diff_augment.py:23-37,95-109`),
* ``translation``: ±12.5% integer shift with zero padding and border-clamp
  (`diff_augment.py:39-53`),
* ``cutout``: 50%-size zero mask at a random (clamped) offset
  (`diff_augment.py:80-93`),
* ``offset``/``offset_h``/``offset_v``: per-image circular roll
  (`diff_augment.py:55-78`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["diff_augment", "random_hflip", "augment_for_discriminator", "AUGMENT_TYPES"]


def _rand_unit(key, b, dtype):
    return jax.random.uniform(key, (b, 1, 1, 1), dtype)


def rand_brightness(key, x, scale):
    return x + (_rand_unit(key, x.shape[0], x.dtype) - 0.5) * scale


def rand_saturation(key, x, scale):
    x_mean = jnp.mean(x, axis=3, keepdims=True)
    factor = (_rand_unit(key, x.shape[0], x.dtype) - 0.5) * 2.0 * scale + 1.0
    return (x - x_mean) * factor + x_mean


def rand_contrast(key, x, scale):
    x_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    factor = (_rand_unit(key, x.shape[0], x.dtype) - 0.5) * 2.0 * scale + 1.0
    return (x - x_mean) * factor + x_mean


def rand_translation(key, x, ratio=0.125):
    """Integer translation with zero fill, matching the reference's
    pad-and-clamped-gather formulation (`diff_augment.py:39-53`)."""
    b, h, w, c = x.shape
    shift_h = int(h * ratio + 0.5)
    shift_w = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    th = jax.random.randint(kh, (b, 1, 1), -shift_h, shift_h + 1)
    tw = jax.random.randint(kw, (b, 1, 1), -shift_w, shift_w + 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows = jnp.clip(jnp.arange(h)[None, :, None] + th + 1, 0, h + 1)
    cols = jnp.clip(jnp.arange(w)[None, None, :] + tw + 1, 0, w + 1)
    batch_idx = jnp.arange(b)[:, None, None]
    return xp[batch_idx, rows, cols]


def rand_cutout(key, x, ratio=0.5):
    """Zero out a random square per image; out-of-range cutout indices clamp
    to the border exactly as the reference's clamped scatter does
    (`diff_augment.py:80-93`)."""
    b, h, w, c = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    kh, kw = jax.random.split(key)
    # Reference: randint(0, size + (1 - cutout_size % 2)) exclusive upper.
    oy = jax.random.randint(kh, (b, 1, 1), 0, h + (1 - ch % 2))
    ox = jax.random.randint(kw, (b, 1, 1), 0, w + (1 - cw % 2))
    y0 = jnp.clip(oy - ch // 2, 0, h - 1)
    y1 = jnp.clip(oy - ch // 2 + ch - 1, 0, h - 1)
    x0 = jnp.clip(ox - cw // 2, 0, w - 1)
    x1 = jnp.clip(ox - cw // 2 + cw - 1, 0, w - 1)
    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    in_cut = (rows >= y0) & (rows <= y1) & (cols >= x0) & (cols <= x1)
    mask = 1.0 - in_cut.astype(x.dtype)
    return x * mask[..., None]


def _roll_per_sample(x, shift, axis):
    """Vectorised per-sample circular roll along a spatial axis."""
    n = x.shape[axis]
    idx = (jnp.arange(n)[None, :] - shift[:, None]) % n
    return jnp.take_along_axis(
        x,
        idx.reshape((x.shape[0],) + tuple(n if a == axis else 1 for a in range(1, x.ndim))),
        axis=axis,
    )


def rand_offset(key, x, ratio=1.0, ratio_h=1.0, ratio_v=1.0):
    """Per-image circular roll (`diff_augment.py:55-72`), vectorised instead
    of the reference's Python loop over ``x.unbind(0)``."""
    b, h, w, c = x.shape
    max_h = int(w * ratio * ratio_h)
    max_v = int(h * ratio * ratio_v)
    kh, kv = jax.random.split(key)
    out = x
    if max_h > 0:
        vh = jax.random.randint(kh, (b,), 0, max_h + 1) * 2 - max_h
        out = _roll_per_sample(out, vh, axis=2)
    if max_v > 0:
        vv = jax.random.randint(kv, (b,), 0, max_v + 1) * 2 - max_v
        out = _roll_per_sample(out, vv, axis=1)
    return out


AUGMENT_TYPES = {
    "brightness": (("brightness", 1.0),),
    "lightbrightness": (("brightness", 0.65),),
    "contrast": (("contrast", 0.5),),
    "lightcontrast": (("contrast", 0.25),),
    "saturation": (("saturation", 1.0),),
    "lightsaturation": (("saturation", 0.5),),
    "color": (("brightness", 1.0), ("saturation", 1.0), ("contrast", 0.5)),
    "lightcolor": (("brightness", 0.65), ("saturation", 0.5), ("contrast", 0.5)),
    "offset": (("offset", (1.0, 1.0, 1.0)),),
    "offset_h": (("offset", (1.0, 1.0, 0.0)),),
    "offset_v": (("offset", (1.0, 0.0, 1.0)),),
    "translation": (("translation", 0.125),),
    "cutout": (("cutout", 0.5),),
}

_FNS = {
    "brightness": rand_brightness,
    "saturation": rand_saturation,
    "contrast": rand_contrast,
    "translation": rand_translation,
    "cutout": rand_cutout,
}


def diff_augment(key: jax.Array, x: jax.Array, types: Sequence[str]) -> jax.Array:
    """Apply the augmentation pipeline for ``types`` in order
    (`DiffAugment`, `diff_augment.py:7-11`)."""
    for t in types:
        for name, arg in AUGMENT_TYPES[t]:
            key, sub = jax.random.split(key)
            if name == "offset":
                rh, rv = arg[1], arg[2]
                x = rand_offset(sub, x, ratio=arg[0], ratio_h=rh, ratio_v=rv)
            else:
                x = _FNS[name](sub, x, arg)
    return x


def random_hflip(key: jax.Array, x: jax.Array, prob: float = 0.5) -> jax.Array:
    """Whole-batch horizontal flip with probability ``prob``
    (`random_hflip`, `stylex_train.py:552-556` — the reference flips the
    entire batch on one draw)."""
    do_flip = jax.random.bernoulli(key, prob)
    return jnp.where(do_flip, jnp.flip(x, axis=2), x)


def augment_for_discriminator(
    key: jax.Array, x: jax.Array, prob: float, types: Sequence[str]
) -> jax.Array:
    """The ``AugWrapper`` pre-D pipeline: with probability ``prob`` apply
    hflip(0.5) + DiffAugment (`AugWrapper.forward`, `stylex_train.py:558-571`).

    The outer bernoulli is a whole-batch decision in the reference too
    (``random() < prob``); implemented with a select so it stays jittable.
    """
    if prob == 0.0 or not types:
        return x
    k_gate, k_flip, k_aug = jax.random.split(key, 3)
    augmented = diff_augment(k_aug, random_hflip(k_flip, x, 0.5), types)
    gate = jax.random.bernoulli(k_gate, prob)
    return jnp.where(gate, augmented, x)
