"""Counterfactual visualisation panels.

Functional equivalents of the reference notebook's rendering cells
(`/root/reference/stylex/run_attfind_combined.ipynb` cells 17-23):
single-coordinate counterfactual generation, side-by-side base/perturbed
panels with probability captions, and per-style image selection by effect
or by distance-to-extreme in StyleSpace. All generation goes through the
explicit ``style_delta`` input — one batched forward for a whole panel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stylex_tpu.attfind.extraction import AttFindRecords
from stylex_tpu.models.stylex import StylExModules
from stylex_tpu.ops.latents import expand_styles

__all__ = [
    "generate_change_image_given_dlatent",
    "generate_images_given_dlatent",
    "visualize_style",
    "visualize_style_by_distance_in_s",
]


# jitted per (modules, classifier) identity: un-jitted generation runs
# op-by-op — one relay round-trip per XLA op on a tunneled TPU, which made
# a single panel take minutes (r4 250-image run). params stay an argument,
# so checkpoint reloads never stale the cache.
_GEN_JIT_CACHE: dict = {}


def _gen(modules, params, classifier_fn, w, noise, delta=None):
    from stylex_tpu.attfind.extraction import _split_classifier

    clf_pure, clf_vars = _split_classifier(classifier_fn)
    key = (id(modules), id(classifier_fn))
    fn = _GEN_JIT_CACHE.get(key)
    if fn is None:

        def run(params, clf_v, w, noise, delta):
            w_styles = expand_styles(w, modules.num_layers)
            # shared noise stays batch-1; the generator broadcasts at the add
            imgs, _ = modules.generate(params, w_styles, noise, style_delta=delta)
            probs = jax.nn.softmax(clf_pure(clf_v, imgs), axis=-1)
            return jnp.clip(imgs, 0.0, 1.0), probs

        fn = jax.jit(run)
        _GEN_JIT_CACHE[key] = fn
    return fn(params, clf_vars, w, jnp.asarray(noise), delta)


def generate_change_image_given_dlatent(
    modules: StylExModules,
    params,
    classifier_fn,
    dlatent: np.ndarray,
    noise: np.ndarray,
    records: AttFindRecords,
    sindex: int,
    direction: int,
    shift_size: float = 1.0,
    class_index: int = 0,
    image_index: Optional[int] = None,
):
    """Single-coordinate counterfactual (cell 17): returns
    (perturbed_image, prob_of_class)."""
    # host-side staging: eager device ops each cost a relay round-trip
    w = jnp.asarray(np.asarray(dlatent)[None])
    coord = (
        records.style_coordinates[image_index, sindex]
        if image_index is not None
        else float(np.mean(records.style_coordinates[:, sindex]))
    )
    extreme = records.minima[sindex] if direction == 0 else records.maxima[sindex]
    shift = (extreme - coord) * shift_size
    C = records.style_change.shape[2]
    delta_np = np.zeros((1, C), np.float32)
    delta_np[0, sindex] = shift
    img, probs = _gen(modules, params, classifier_fn, w, noise, jnp.asarray(delta_np))
    return np.asarray(img[0]), float(probs[0, class_index])


def generate_images_given_dlatent(
    modules, params, classifier_fn, dlatent, noise, records,
    sindex: int, direction: int, shift_size: float = 1.0, class_index: int = 0,
    image_index: Optional[int] = None, draw_probs: bool = True,
    return_probs: bool = False,
):
    """Side-by-side (base, perturbed) panel with probability captions
    (cells 18-19). Returns an (H, 2W, 3) uint8 array, or
    ``(panel, base_prob, change_prob)`` with ``return_probs`` (the
    reference's 3-tuple return that cell 20 filters on)."""
    from stylex_tpu.utils.image import to_uint8

    w = jnp.asarray(np.asarray(dlatent)[None])
    base_img, base_probs = _gen(modules, params, classifier_fn, w, noise)
    pert_img, pert_prob = generate_change_image_given_dlatent(
        modules, params, classifier_fn, dlatent, noise, records,
        sindex, direction, shift_size, class_index, image_index,
    )
    panel = np.concatenate([np.asarray(base_img[0]), pert_img], axis=1)
    panel = to_uint8(panel[None])[0]
    base_prob = float(base_probs[0, class_index])
    if draw_probs:
        panel = _caption(panel, f"{base_prob:.2f} -> {pert_prob:.2f}")
    if return_probs:
        return panel, base_prob, pert_prob
    return panel


def _caption(img: np.ndarray, text: str) -> np.ndarray:
    from PIL import Image, ImageDraw

    pil = Image.fromarray(img)
    bar = Image.new("RGB", (pil.width, 12), (0, 0, 0))
    ImageDraw.Draw(bar).text((2, 1), text, fill=(255, 255, 255))
    out = Image.new("RGB", (pil.width, pil.height + 12))
    out.paste(pil, (0, 0))
    out.paste(bar, (0, pil.height))
    return np.asarray(out)


def visualize_style(
    modules, params, classifier_fn, records: AttFindRecords,
    sindex: int, direction: int, shift_size: float = 1.0, class_index: int = 0,
    effect_threshold: float = 0.1, max_images: int = 10, min_images: int = 3,
    seed: Optional[int] = None, allow_both_directions_change: bool = False,
) -> Optional[np.ndarray]:
    """Render panels for images where this style's effect exceeds the
    threshold (cell 20); returns None when fewer than ``min_images`` qualify.

    Matches the reference's candidate flow: shuffle the qualifying images
    (optionally seeded), over-sample ``max_images*10`` candidates, and keep
    a panel only if the REALIZED probability change of the re-generated
    counterfactual is at least ``effect_threshold`` — the recorded effect is
    a necessary but not sufficient condition (e.g. saturated softmax)."""
    effects = records.style_change[:, direction, sindex, class_index]
    if allow_both_directions_change:
        images_idx = np.flatnonzero(np.abs(effects) > effect_threshold)
    else:
        images_idx = np.flatnonzero(effects > effect_threshold)
    if images_idx.size == 0:
        return None
    rng = np.random.RandomState(seed) if seed is not None else np.random
    rng.shuffle(images_idx)
    images_idx = images_idx[: min(max_images * 10, len(images_idx))]

    rows = []
    for i in images_idx:
        panel, base_prob, change_prob = generate_images_given_dlatent(
            modules, params, classifier_fn, records.latents[i], records.noise, records,
            sindex, direction, shift_size, class_index, image_index=int(i),
            return_probs=True,
        )
        if abs(change_prob - base_prob) < effect_threshold:
            continue
        rows.append(panel)
        if len(rows) == max_images:
            break
    if len(rows) < min_images:
        return None
    return np.concatenate(rows, axis=0)


def visualize_style_by_distance_in_s(
    modules, params, classifier_fn, records: AttFindRecords,
    sindex: int, direction: int, shift_size: float = 1.0, class_index: int = 0,
    max_images: int = 10,
) -> np.ndarray:
    """Render panels for images sorted by distance-to-extreme in StyleSpace
    (cell 21) — images far from the target extreme change the most."""
    extreme = records.minima[sindex] if direction == 0 else records.maxima[sindex]
    dist = np.abs(extreme - records.style_coordinates[:, sindex])
    order = np.argsort(dist)[::-1][:max_images]
    rows = []
    for i in order:
        rows.append(
            generate_images_given_dlatent(
                modules, params, classifier_fn, records.latents[i], records.noise, records,
                sindex, direction, shift_size, class_index, image_index=int(i),
            )
        )
    return np.concatenate(rows, axis=0)
