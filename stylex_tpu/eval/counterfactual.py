"""Counterfactual evaluation — the FID-vs-top-k-attributes protocol.

Re-creation of `/root/reference/stylex/FID_TensorFlow.ipynb` (SURVEY §2.12)
on our stack:

* :func:`find_significant_styles_filtered` — the greedy search *with* the
  discriminator-rejection branch the PyTorch notebook drops (cells 11-12):
  a candidate style is rejected if perturbing it moves the discriminator
  score by more than ``change_threshold`` on probe images,
* :func:`create_counterfactual_dataset` — apply the top-k shifts jointly
  per image, with direction auto-flipped by the image's base class
  (cell 20); the TF notebook's bias assign_add/assign_sub dance becomes a
  single batched ``style_delta``,
* :func:`fid_topk` — FID(original, generated) then FID(original,
  counterfactual-with-top-1..k) (cells 24-26), streaming on-device features
  instead of PNG directories, with a ``fid_results.csv`` writer.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stylex_tpu.attfind.extraction import AttFindRecords
from stylex_tpu.models.stylex import StylExModules
from stylex_tpu.ops.latents import expand_styles

__all__ = [
    "find_significant_styles_filtered",
    "create_counterfactual_dataset",
    "fid_topk",
]


def _make_probe_fn(modules, params, classifier_fn):
    """ONE jitted D-score probe for the rejection filter: eager op-by-op
    forwards cost a remote compile per op shape on relayed TPUs
    (utils/device.py), turning the greedy search into minutes per
    candidate. Probe batches are padded to a fixed size by the caller, so
    every candidate reuses the same compiled program."""

    @jax.jit
    def probe(w, noise_b, deltas):
        w_styles = expand_styles(w, modules.num_layers)
        base, _ = modules.generate(params, w_styles, noise_b)
        pert, _ = modules.generate(params, w_styles, noise_b, style_delta=deltas)
        if modules.cfg.arch.value == "new":
            probs_b = jax.nn.softmax(classifier_fn(base), axis=-1)
            probs_p = jax.nn.softmax(classifier_fn(pert), axis=-1)
            d_base = modules.discriminate(params, base, probs_b)
            d_pert = modules.discriminate(params, pert, probs_p)
        else:
            d_base = modules.discriminate(params, base)
            d_pert = modules.discriminate(params, pert)
        return jnp.abs(d_base - d_pert)

    return probe


def _discriminator_filter(
    modules, params, classifier_fn, records: AttFindRecords,
    sindex: int, class_index: int, num_images: int = 10,
    change_threshold: float = 0.5, shift_size: float = 2.0,
    effect_threshold: float = 0.2, probe_fn=None,
) -> bool:
    """True if the style passes: no probe image's D score moves more than
    ``change_threshold`` when the coordinate is pushed to its extreme
    (cell 11). Probes run as one jitted batched forward per direction."""
    C = records.style_change.shape[2]
    noise = jnp.asarray(records.noise)
    if probe_fn is None:
        probe_fn = _make_probe_fn(modules, params, classifier_fn)
    for direction in range(2):
        effects = records.style_change[:, direction, sindex, class_index]
        idx = np.flatnonzero(effects > effect_threshold)[:num_images]
        if len(idx) == 0:
            continue
        # pad to the fixed probe size (duplicates can't change the any())
        idx = np.concatenate([idx, np.full(num_images - len(idx), idx[0])])
        w = jnp.asarray(records.latents[idx])
        noise_b = jnp.broadcast_to(noise, (len(idx),) + noise.shape[1:])
        extreme = records.minima[sindex] if direction == 0 else records.maxima[sindex]
        shifts = (extreme - records.style_coordinates[idx, sindex]) * shift_size
        deltas = np.zeros((len(idx), C), np.float32)
        deltas[:, sindex] = shifts
        moves = probe_fn(w, noise_b, jnp.asarray(deltas))
        if bool(jnp.any(moves > change_threshold)):
            return False
    return True


def find_significant_styles_filtered(
    records: AttFindRecords,
    num_indices: int,
    class_index: int,
    modules: Optional[StylExModules] = None,
    params=None,
    classifier_fn=None,
    max_image_effect: float = 0.2,
    discriminator_threshold: float = 0.2,
    use_discriminator: bool = True,
    sindex_offset: int = 0,
) -> Tuple[List[Tuple[int, int]], List[int]]:
    """Greedy top-k with discriminator rejection (cell 12).

    Returns (picks, rejected_sindices). With ``use_discriminator=False``
    this reduces to the plain greedy search.
    """
    effect4 = records.style_change
    num_images, _, C, _ = effect4.shape
    effect = np.maximum(0.0, effect4[:, :, :, class_index]).reshape(num_images, -1)
    # termination guards (rejections zero columns without picking, so the
    # greedy loop can exhaust StyleSpace before reaching num_indices):
    # never ask for more picks than columns, and stop once no positive
    # effect remains anywhere — argmax would emit duplicate (0, 0) picks
    num_indices = min(num_indices, effect.shape[1])
    images_effect = np.zeros(num_images)
    picks: List[int] = []
    removed: List[int] = []
    probe_fn = None
    while len(picks) < num_indices and effect.max() > 0.0:
        active = images_effect < max_image_effect
        if not np.any(active):
            active = np.ones(num_images, bool)
        next_s = int(np.argmax(np.mean(effect[active], axis=0)))
        sindex = next_s % C
        if use_discriminator and modules is not None:
            if sindex == 0 and effect[:, next_s].max() == 0.0:
                break
            if probe_fn is None:
                probe_fn = _make_probe_fn(modules, params, classifier_fn)
            if not _discriminator_filter(
                modules, params, classifier_fn, records, sindex, class_index,
                change_threshold=discriminator_threshold, probe_fn=probe_fn,
            ):
                effect[:, next_s] = 0.0
                removed.append(sindex)
                continue
        picks.append(next_s)
        images_effect += effect[:, next_s]
        effect[:, next_s] = 0.0
    return [(s // C, (s % C) + sindex_offset) for s in picks], removed


def create_counterfactual_dataset(
    modules: StylExModules,
    params,
    classifier_fn,
    records: AttFindRecords,
    s_indices_and_signs: Sequence[Tuple[int, int]],
    k: int,
    shift_size: float = 1.0,
    batch_size: int = 32,
    gen_fn=None,
) -> np.ndarray:
    """Apply the top-k attribute shifts jointly to every image (cell 20).

    Direction flips per image: a base-class-0 image moves styles the other
    way, so every counterfactual crosses the decision boundary in the same
    logical direction. All images generate in batches with a dense
    ``style_delta`` matrix — no model mutation.

    Returns (N, S, S, 3) counterfactual images in [0, 1].
    """
    picks = list(s_indices_and_signs)[:k]
    N = records.latents.shape[0]
    C = records.style_change.shape[2]
    base_class = np.argmax(records.base_prob, axis=1)
    flip = base_class == 0  # cell 20: argmax==0 -> flip

    deltas = np.zeros((N, C), np.float32)
    for direction, sindex in picks:
        eff_dir = np.where(flip, 1 - direction, direction)
        extreme = np.where(eff_dir == 0, records.minima[sindex], records.maxima[sindex])
        # shifts COMPOUND: the notebook re-reads the style vector after each
        # bias assign_add (cell 20 recomputes s_vals inside the picks loop),
        # so a pick targeting an already-shifted coordinate lands exactly at
        # its extreme instead of overshooting by the earlier shift
        current = records.style_coordinates[:, sindex] + deltas[:, sindex]
        deltas[:, sindex] += (extreme - current) * shift_size

    if gen_fn is None:
        gen_fn = _make_counterfactual_gen_fn(modules, params)
    noise = jnp.asarray(records.noise)
    outs = []
    for start in range(0, N, batch_size):
        w = jnp.asarray(records.latents[start : start + batch_size])
        noise_b = jnp.broadcast_to(noise, (w.shape[0],) + noise.shape[1:])
        outs.append(
            np.asarray(gen_fn(w, noise_b, jnp.asarray(deltas[start : start + batch_size])))
        )
    return np.concatenate(outs)


def _make_counterfactual_gen_fn(modules, params):
    """One jitted generator forward shared by all k+1 fid_topk passes —
    per-call eager forwards would pay remote compiles per op shape on
    relayed TPUs (utils/device.py). ``params`` rides as a runtime argument
    (bound here) so the weights are not baked into the executable as
    constants (see ``attfind.extraction._split_classifier``)."""

    @jax.jit
    def gen(p, w, noise_b, deltas):
        w_styles = expand_styles(w, modules.num_layers)
        imgs, _ = modules.generate(p, w_styles, noise_b, style_delta=deltas)
        return jnp.clip(imgs, 0.0, 1.0)

    return lambda w, noise_b, deltas: gen(params, w, noise_b, deltas)


def fid_topk(
    modules: StylExModules,
    params,
    classifier_fn,
    records: AttFindRecords,
    s_indices_and_signs: Sequence[Tuple[int, int]],
    k: int = 10,
    shift_size: float = 1.0,
    batch_size: int = 32,
    csv_path: Optional[str] = None,
    feature_fn=None,
) -> List[float]:
    """FID(original, generated), then FID(original, counterfactual top-1..k)
    (cells 24-26). Writes ``fid_results.csv`` when ``csv_path`` is given."""
    originals = records.original_images

    def batches(arr):
        for start in range(0, arr.shape[0], batch_size):
            yield arr[start : start + batch_size]

    from stylex_tpu.eval.fid import (
        compute_feature_stats,
        frechet_distance,
        resolve_feature_fn,
    )

    # the originals' feature statistics are shared by every comparison —
    # compute them once, not k+1 times
    feature_fn = resolve_feature_fn(feature_fn)
    mu_o, cov_o = compute_feature_stats(batches(originals), feature_fn)

    def fid_vs_originals(imgs):
        mu, cov = compute_feature_stats(batches(imgs), feature_fn)
        return frechet_distance(mu_o, cov_o, mu, cov)

    # base generated set: encoder round-trip latents, no shifts
    gen_fn = _make_counterfactual_gen_fn(modules, params)
    generated = create_counterfactual_dataset(
        modules, params, classifier_fn, records, [], 0, shift_size, batch_size,
        gen_fn=gen_fn,
    )
    fids = [fid_vs_originals(generated)]
    for i in range(k):
        cf = create_counterfactual_dataset(
            modules, params, classifier_fn, records, s_indices_and_signs, i + 1,
            shift_size, batch_size, gen_fn=gen_fn,
        )
        fids.append(fid_vs_originals(cf))
    if csv_path:
        Path(csv_path).parent.mkdir(parents=True, exist_ok=True)
        with open(csv_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["k", "fid"])
            w.writerow(["generated", fids[0]])
            for i, fid in enumerate(fids[1:], 1):
                w.writerow([i, fid])
    return fids
