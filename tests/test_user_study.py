"""User-study stimulus generator tests (odd-one-out GIFs + answer key)."""

import re

import numpy as np
import pytest

import jax

from stylex_tpu.attfind.extraction import AttFindRecords
from stylex_tpu.config import ModelConfig
from stylex_tpu.models import build_stylex, init_stylex_params
from stylex_tpu.models.classifiers import build_classifier
from stylex_tpu.user_study import (
    QUADRANT_NAMES,
    generate_user_study,
    render_study_frames,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    modules = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(0), modules)
    clf = build_classifier("mobilenet", cfg.image_size)

    n = 5
    C = modules.total_style_coords
    rng = np.random.RandomState(0)
    coords = rng.randn(n, C).astype(np.float32)
    # two strong styles so rank_styles yields >=2 picks at threshold 0.1
    style_change = rng.uniform(0.0, 0.05, (n, 2, C, 2)).astype(np.float32)
    style_change[:, 0, 1, 0] = 0.9
    style_change[:, 1, 3, 0] = 0.8
    records = AttFindRecords(
        style_change=style_change,
        latents=rng.randn(n, cfg.latent_dim).astype(np.float32),
        base_prob=np.tile([2.0, -2.0], (n, 1)).astype(np.float32),
        minima=coords.min(0) - 0.5,
        maxima=coords.max(0) + 0.5,
        style_coordinates=coords,
        original_images=rng.rand(n, 16, 16, 3).astype(np.float32),
        noise=rng.rand(1, 16, 16, 1).astype(np.float32),
        discriminator=np.zeros((n, 1), np.float32),
    )
    return modules, params, clf.classify_images, records


def test_render_study_frames_geometry(setup):
    modules, params, clf_fn, records = setup
    base, pert = render_study_frames(
        modules, params, clf_fn, records,
        image_ids=[0, 1, 2, 3],
        styles=[(0, 1)] * 3 + [(1, 3)],
        panel_px=32, gutter=2,
    )
    side = 2 * 32 + 3 * 2  # the reference's 1030 = 2*512 + 3*2 geometry
    assert base.shape == (side, side, 3) and base.dtype == np.uint8
    assert pert.shape == base.shape
    # the counterfactual frame must actually differ from the base frame
    assert np.abs(base.astype(int) - pert.astype(int)).max() > 0


def test_generate_user_study_artifacts(setup, tmp_path):
    modules, params, clf_fn, records = setup
    studies = generate_user_study(
        modules, params, clf_fn, records, tmp_path,
        num_studies=3, num_indices=4, effect_threshold=0.1,
        panel_px=24, seed=7,
    )
    assert len(studies) == 3
    # every stimulus GIF exists, two frames, reference geometry
    from PIL import Image

    gifs = {st["gif"] for st in studies}
    assert gifs == set(range(3))  # shuffled order is a permutation
    for st in studies:
        gif = Image.open(tmp_path / f"class_study_{st['gif']}.gif")
        assert gif.n_frames == 2
        assert gif.size == (2 * 24 + 3 * 2,) * 2
        # exactly one odd quadrant, three majority quadrants
        styles = st["styles"]
        odd = styles[st["odd_position"]]
        majority = [s for q, s in enumerate(styles) if q != st["odd_position"]]
        assert len(set(majority)) == 1 and odd != majority[0]

    # answer key: reference textual schema, one block per question
    info = (tmp_path / "info_of_images.txt").read_text()
    blocks = [b for b in info.split("\n\n") if b.strip()]
    assert len(blocks) == 3
    for st, block in zip(studies, blocks):
        assert f"Odd transformation in {QUADRANT_NAMES[st['odd_position']]}" in block
        assert f"({st['question']}, {st['gif']})" in block
        mat = np.asarray(st["styles"])
        assert re.search(rf"\[\s*{mat[0, 0]}\s+{mat[0, 1]}\]", block)


def test_generate_user_study_deterministic(setup, tmp_path):
    modules, params, clf_fn, records = setup
    a = generate_user_study(
        modules, params, clf_fn, records, tmp_path / "a",
        num_studies=2, num_indices=4, effect_threshold=0.1, panel_px=16, seed=3,
    )
    b = generate_user_study(
        modules, params, clf_fn, records, tmp_path / "b",
        num_studies=2, num_indices=4, effect_threshold=0.1, panel_px=16, seed=3,
    )
    assert a == b
