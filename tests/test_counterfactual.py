"""Counterfactual evaluation + classifier-training tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.attfind import attfind_extraction
from stylex_tpu.config import ModelConfig
from stylex_tpu.eval.counterfactual import (
    create_counterfactual_dataset,
    fid_topk,
    find_significant_styles_filtered,
)
from stylex_tpu.eval.fid import FeatureStats, frechet_distance
from stylex_tpu.models import build_stylex, init_stylex_params
from stylex_tpu.models.classifiers import build_classifier


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    modules = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(0), modules)
    clf = build_classifier("mobilenet", cfg.image_size)
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (6, 16, 16, 3)))
    noise = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 1)))
    records = attfind_extraction(
        modules, params, clf.classify_images, images, noise, coord_batch=64, progress=False
    )
    return cfg, modules, params, clf.classify_images, records


def test_frechet_distance_basics():
    rng = np.random.RandomState(0)
    a = rng.randn(500, 8)
    b = rng.randn(500, 8) + 3.0
    sa, sb = FeatureStats(8), FeatureStats(8)
    sa.update(jnp.asarray(a))
    sb.update(jnp.asarray(b))
    mu_a, c_a = sa.finalize()
    mu_b, c_b = sb.finalize()
    np.testing.assert_allclose(mu_a, a.mean(0), rtol=1e-4, atol=1e-4)
    same = frechet_distance(mu_a, c_a, mu_a, c_a)
    diff = frechet_distance(mu_a, c_a, mu_b, c_b)
    assert abs(same) < 1e-3
    assert diff > 50.0


def test_counterfactual_dataset_flips_by_class(setup):
    cfg, modules, params, clf_fn, records = setup
    picks = [(1, 5), (0, 40)]
    cf = create_counterfactual_dataset(modules, params, clf_fn, records, picks, k=2)
    assert cf.shape == records.original_images.shape
    base = create_counterfactual_dataset(modules, params, clf_fn, records, [], k=0)
    # shifts must actually change the images
    assert np.abs(cf - base).mean() > 1e-5


def test_find_significant_styles_filtered_no_disc(setup):
    cfg, modules, params, clf_fn, records = setup
    picks, removed = find_significant_styles_filtered(
        records, num_indices=3, class_index=0, use_discriminator=False,
        max_image_effect=100.0,
    )
    assert len(picks) == 3 and removed == []
    # matches the plain greedy implementation
    from stylex_tpu.attfind import find_significant_styles

    plain = find_significant_styles(records.style_change, 3, 0, max_image_effect=100.0)
    assert picks == plain


def test_find_significant_styles_filtered_with_disc(setup):
    cfg, modules, params, clf_fn, records = setup
    picks, removed = find_significant_styles_filtered(
        records, num_indices=2, class_index=0,
        modules=modules, params=params, classifier_fn=clf_fn,
        max_image_effect=100.0, discriminator_threshold=1e9,  # accept everything
    )
    assert len(picks) == 2


def test_fid_topk_monotone_shape(setup):
    cfg, modules, params, clf_fn, records = setup
    fids = fid_topk(modules, params, clf_fn, records, [(1, 5)], k=1, batch_size=3)
    assert len(fids) == 2
    assert all(np.isfinite(f) for f in fids)


@pytest.mark.slow
def test_classifier_trainer_learns_separable_data(tmp_path):
    """End-to-end classifier training on a trivially separable problem."""
    from stylex_tpu.train.classifier_training import ClassifierTrainer

    rng = np.random.RandomState(0)

    def batches():
        for _ in range(8):
            labels = rng.randint(0, 2, size=16)
            images = np.zeros((16, 32, 32, 3), np.float32)
            images += labels[:, None, None, None] * 0.8 + 0.1
            images += rng.rand(16, 32, 32, 3).astype(np.float32) * 0.05
            yield images, labels

    tr = ClassifierTrainer("resnet", lr=1e-3)
    tr.init(32)
    tr.set_trainable()  # all trainable
    hist = tr.fit(batches, batches, epochs=2, checkpoint_path=str(tmp_path / "c.msgpack"))
    assert hist["best_val_accuracy"] > 0.9


@pytest.mark.slow
def test_mobilenet_freeze_mask_shapes():
    from stylex_tpu.models.classifiers import MobileNetV2
    from stylex_tpu.train.classifier_training import mobilenet_freeze_mask

    model = MobileNetV2()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), train=True,
    )
    mask = mobilenet_freeze_mask(variables["params"], amount_frozen_layers=15)
    # stem + first 14 blocks frozen; later blocks + head + classifier trainable
    assert not jax.tree.leaves(mask["stem"])[0]
    assert not jax.tree.leaves(mask["block0"])[0]
    assert jax.tree.leaves(mask["block14"])[0]
    assert jax.tree.leaves(mask["classifier"])[0]
    mask_all = mobilenet_freeze_mask(variables["params"], freeze_all=True)
    assert jax.tree.leaves(mask_all["classifier"])[0]
    assert not jax.tree.leaves(mask_all["head"])[0]


def test_resolve_feature_fn_accepts_bound_methods():
    """Caller-provided extractors that reject attribute writes (bound
    methods, jitted wrappers) must still come back tagged for the stats
    cache instead of raising AttributeError."""
    from stylex_tpu.eval.fid import resolve_feature_fn

    class Extractor:
        def features(self, x):
            return x.reshape(x.shape[0], -1)

    a, b = Extractor(), Extractor()
    fn = resolve_feature_fn(a.features)
    assert "Extractor.features-" in fn.tag
    # distinct instances (different weights) must never share a cache key
    assert fn.tag != resolve_feature_fn(b.features).tag
    x = jnp.ones((2, 4, 4, 3))
    assert fn(x).shape == (2, 48)

    tagged = lambda x: x  # noqa: E731
    tagged.tag = "mine"
    assert resolve_feature_fn(tagged) is tagged
