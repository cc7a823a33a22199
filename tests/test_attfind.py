"""AttFind tests: batched sweep equivalence, greedy selection, records IO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.attfind import (
    attfind_extraction,
    find_significant_styles,
    filter_unstable_images,
    merge_and_score,
    load_records_hdf5,
    save_records_hdf5,
)
from stylex_tpu.config import ModelConfig
from stylex_tpu.models import build_stylex, init_stylex_params
from stylex_tpu.models.classifiers import build_classifier
from stylex_tpu.ops.latents import expand_styles


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    modules = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(0), modules)
    clf = build_classifier("mobilenet", cfg.image_size)
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3)))
    noise = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 1)))
    return cfg, modules, params, clf.classify_images, images, noise


@pytest.fixture(scope="module")
def records(tiny_setup):
    cfg, modules, params, clf_fn, images, noise = tiny_setup
    return attfind_extraction(
        modules, params, clf_fn, images, noise, coord_batch=64, progress=False
    )


def test_extraction_shapes(tiny_setup, records):
    cfg, modules, *_ = tiny_setup
    C = modules.total_style_coords
    assert records.style_change.shape == (4, 2, C, 2)
    assert records.latents.shape == (4, cfg.latent_dim)
    assert records.style_coordinates.shape == (4, C)
    assert np.all(records.minima <= records.maxima)
    assert np.isfinite(records.style_change).all()
    # every array the hdf5 schema stores is float32 regardless of the
    # sweep's compute dtype
    for f in ("style_change", "latents", "base_prob", "minima", "maxima",
              "style_coordinates", "discriminator"):
        assert getattr(records, f).dtype == np.float32, f
    # the per-stage wall breakdown rides along (not written to the hdf5)
    assert records.stage_walls and "phase1" in records.stage_walls


def test_bf16_sweep_matches_f32_ranking(tiny_setup, records):
    """compute_dtype=bfloat16 (the TPU-native record path): same shapes,
    f32 output arrays, and per-(direction,sindex) mean effects close to the
    f32 sweep — close enough that greedy top-k picks from either agree at
    the tiny scale."""
    cfg, modules, params, clf_fn, images, noise = tiny_setup
    bf16_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params,
    )
    rec16 = attfind_extraction(
        modules, bf16_params, clf_fn, images, noise, coord_batch=64,
        progress=False, compute_dtype=jnp.bfloat16,
    )
    assert rec16.style_change.dtype == np.float32
    assert rec16.style_change.shape == records.style_change.shape
    # mean effect per (direction, sindex, class): the ranking statistic
    m32 = records.style_change.mean(axis=0)
    m16 = rec16.style_change.mean(axis=0)
    # bf16 has ~3 significant digits; the effects here are O(1e-3..1)
    assert np.isfinite(m16).all()
    np.testing.assert_allclose(m16, m32, atol=0.08)


def test_sweep_matches_single_perturbation(tiny_setup, records):
    """The batched chunked sweep must equal a one-at-a-time perturbed
    forward — the reference's semantics (notebook cell 5)."""
    cfg, modules, params, clf_fn, images, noise = tiny_setup
    C = modules.total_style_coords
    rng = np.random.RandomState(0)
    for sindex in rng.choice(C, size=3, replace=False):
        for direction in (0, 1):
            i = 1  # image index
            coord = records.style_coordinates[i, sindex]
            extreme = records.minima[sindex] if direction == 0 else records.maxima[sindex]
            shift = extreme - coord
            delta = jnp.zeros((1, C)).at[0, sindex].set(shift)
            w_styles = expand_styles(jnp.asarray(records.latents[i])[None], modules.num_layers)
            gen, _ = modules.generate(params, w_styles, jnp.asarray(noise), style_delta=delta)
            logits = clf_fn(gen)
            want = np.asarray(logits[0]) - records.base_prob[i]
            got = records.style_change[i, direction, sindex]
            np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_records_hdf5_roundtrip(records, tmp_path):
    path = save_records_hdf5(records, str(tmp_path / "style_change_records.hdf5"))
    back = load_records_hdf5(path)
    np.testing.assert_allclose(back.style_change, records.style_change, rtol=1e-6)
    np.testing.assert_allclose(back.original_images, records.original_images, rtol=1e-6)
    np.testing.assert_allclose(back.minima, records.minima, rtol=1e-6)


def test_find_significant_styles_greedy():
    # Synthetic effects: coordinate 5 (direction 1) has the largest mean
    # positive effect, then coordinate 2 (direction 0).
    N, C = 6, 10
    eff = np.zeros((N, 2, C, 2))
    eff[:, 1, 5, 0] = 1.0
    eff[:, 0, 2, 0] = 0.5
    eff[:, 0, 7, 0] = 0.1
    picks = find_significant_styles(eff, num_indices=3, class_index=0, max_image_effect=100.0)
    assert picks[0] == (1, 5)
    assert picks[1] == (0, 2)
    assert picks[2] == (0, 7)


def test_find_significant_styles_respects_image_budget():
    # Once images accumulate effect beyond the budget they stop voting.
    N, C = 4, 4
    eff = np.zeros((N, 2, C, 2))
    eff[:, 0, 0, 0] = 1.0  # first pick saturates every image
    eff[:2, 0, 1, 0] = 0.9
    eff[2:, 0, 2, 0] = 0.8
    picks = find_significant_styles(eff, num_indices=2, class_index=0, max_image_effect=0.5)
    assert picks[0] == (0, 0)
    # all images saturated -> falls back to all-image vote: coordinate 1
    assert picks[1] == (0, 1)


def test_merge_and_score_flips_class1_directions():
    N, C = 5, 6
    eff = np.random.RandomState(0).rand(N, 2, C, 2) * 0.1
    eff[:, 0, 3, 0] = 0.9  # strong class-0 signal
    eff[:, 1, 4, 1] = 0.8  # strong class-1 signal at (dir=1, s=4)
    picks = merge_and_score(eff, {0: [(0, 3)], 1: [(1, 4)]}, num_indices=2)
    assert (0, 3) in picks
    assert (0, 4) in picks  # direction flipped from class-1 pick


def test_filter_unstable_images():
    eff = np.zeros((3, 2, 100, 2))
    eff[1, :, :, :] = 1.0  # 400 large effects -> unstable
    out = filter_unstable_images(eff, effect_threshold=0.3, num_indices_threshold=150)
    assert out[1].sum() == 0.0
    assert (out[0] == eff[0]).all()


def test_block_resume_matches_flat_sweep(tiny_setup, records):
    """The block-grouped resume sweep (default) must reproduce the flat
    full-recompute sweep exactly — same effects, same layout."""
    cfg, modules, params, clf_fn, images, noise = tiny_setup
    flat = attfind_extraction(
        modules, params, clf_fn, images, noise, coord_batch=64, progress=False,
        block_resume=False,
    )
    np.testing.assert_allclose(
        records.style_change, flat.style_change, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(records.latents, flat.latents)
    np.testing.assert_array_equal(records.base_prob, flat.base_prob)


def test_multi_chunk_dispatch_matches_per_chunk(tiny_setup, records):
    """K chunks fused into one lax.scan dispatch (chunks_per_dispatch) must
    be bit-identical to one dispatch per chunk — same chunk bodies, same
    enumeration order, tail padding trimmed."""
    cfg, modules, params, clf_fn, images, noise = tiny_setup
    single = attfind_extraction(
        modules, params, clf_fn, images, noise, coord_batch=64, progress=False,
        chunks_per_dispatch=1,
    )
    np.testing.assert_array_equal(records.style_change, single.style_change)
    # and a K that does NOT divide the chunk count, forcing tail padding
    k3 = attfind_extraction(
        modules, params, clf_fn, images, noise, coord_batch=64, progress=False,
        chunks_per_dispatch=3,
    )
    np.testing.assert_array_equal(records.style_change, k3.style_change)


def test_visualize_style_filters_on_realized_prob_change(tiny_setup, records):
    """Cell 20's post-generation filter: a panel survives only if the
    RE-GENERATED counterfactual moves the classifier probability by at
    least effect_threshold — a constant classifier (zero realized change)
    must yield no panels even when the recorded effects pass, while a
    permissive threshold keeps them."""
    from stylex_tpu.attfind import visualize_style

    cfg, modules, params, clf_fn, images, noise = tiny_setup
    import dataclasses

    sc = records.style_change.copy()
    sc[:, 0, 7, 0] = 1.0  # every image's recorded effect passes the threshold
    rec = dataclasses.replace(records, style_change=sc)

    constant_clf = lambda imgs: jnp.zeros((imgs.shape[0], 2))
    panel = visualize_style(
        modules, params, constant_clf, rec, sindex=7, direction=0,
        effect_threshold=0.1, min_images=1, seed=0,
    )
    assert panel is None  # recorded effect high, realized prob change zero

    panel = visualize_style(
        modules, params, constant_clf, rec, sindex=7, direction=0,
        effect_threshold=0.0, min_images=1, seed=0,
    )
    assert panel is not None and panel.ndim == 3


def test_extraction_num_images_keeps_first_survivors(tiny_setup):
    """The streaming 'first N survivors' semantics: a larger candidate pool
    is truncated to num_images after the (here absent) filter."""
    cfg, modules, params, clf_fn, images, noise = tiny_setup
    rec = attfind_extraction(
        modules, params, clf_fn, images, noise, coord_batch=64,
        progress=False, num_images=2,
    )
    assert rec.style_change.shape[0] == 2
    assert rec.original_images.shape[0] == 2
