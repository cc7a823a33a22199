"""TF SavedModel ingestion tests (VERDICT r2 Missing #2 / Next #5).

The real Google artifacts (`FID_TensorFlow.ipynb` cell 5) cannot be
downloaded offline, so these tests exercise the full path against a
synthetic SavedModel with the documented layout (``tests/tf_twin.py``):

* converter -> JAX generator parity with the TF twin (dlatent tiling,
  ``call_synthesis`` clipping),
* the notebook's literal ``dense_bias.assign_add`` counterfactual mutation
  on the *restored* SavedModel == our explicit ``style_delta`` path,
* ``google_fid_topk`` end-to-end from an on-disk SavedModel directory,
  TF-driven and converted-JAX-driven, agreeing with each other,
* ``examples_1.tfrecord`` parsing (cell 7 schema).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from stylex_tpu.ingest_tf import (
    GoogleStylExTF,
    convert_google_generator,
    describe_savedmodel,
    google_fid_topk,
    load_examples_tfrecord,
)
from stylex_tpu.models.google_stylex import GoogleStylExGenerator

from tf_twin import (
    TwinGenerator,
    perturb_broken_layout,
    perturb_keras_layout,
    perturb_nested_layout,
    save_twins,
)

SPEC = GoogleStylExGenerator(
    image_size=16,
    dlatent_dim=20,
    channels_map=((4, 32), (8, 16), (16, 8)),
)


@pytest.fixture(scope="module")
def saved_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("google_stylex")
    save_twins(root, SPEC, seed=3)
    return root


@pytest.fixture(scope="module")
def models(saved_root):
    return GoogleStylExTF(saved_root, num_layers=SPEC.num_layers)


def test_describe_savedmodel(saved_root):
    vars_ = describe_savedmodel(saved_root / "generator.savedmodel")
    names = " ".join(n for n, _, _ in vars_)
    assert "kernel" in names and "const" in names
    assert any(s == (1, 32) for _, s, _ in vars_)  # a dense_bias


def test_layer_shapes_and_sindex(models):
    assert models.layer_shapes == SPEC.layer_shapes == [32, 32, 16, 16, 8]
    assert models.sindex_to_layer_and_index(0) == (0, 0)
    assert models.sindex_to_layer_and_index(33) == (1, 1)
    assert models.sindex_to_layer_and_index(103) == (4, 7)


def test_convert_and_synthesis_parity(saved_root, models):
    gen, params = convert_google_generator(saved_root / "generator.savedmodel")
    assert gen.image_size == SPEC.image_size
    assert gen.dlatent_dim == SPEC.dlatent_dim
    assert gen.layer_shapes == SPEC.layer_shapes

    rng = np.random.RandomState(0)
    w = rng.randn(3, SPEC.dlatent_dim).astype(np.float32)
    tiled = np.tile(w[:, None, :], (1, SPEC.num_layers, 1))

    want = models.call_synthesis(tiled)  # NCHW, clipped
    got = np.asarray(gen.call_synthesis(params, jnp.asarray(tiled)))  # NHWC
    np.testing.assert_allclose(
        got.transpose(0, 3, 1, 2), want, atol=2e-4
    )

    # style space parity too
    sv_tf = models.style_vectors(w)
    conv_styles, _ = gen.style_vectors(params, jnp.asarray(w))
    sv_jax = np.concatenate([np.asarray(s) for s in conv_styles], axis=1)
    np.testing.assert_allclose(sv_jax, sv_tf, atol=1e-4)


def test_counterfactual_mutation_equals_style_delta(saved_root, models):
    """The restored SavedModel's bias assign_add dance (cell 20) == the
    jitted explicit style_delta path on converted weights."""
    gen, params = convert_google_generator(saved_root / "generator.savedmodel")
    rng = np.random.RandomState(1)
    latents = rng.randn(2, SPEC.dlatent_dim).astype(np.float32)
    sv = models.style_vectors(latents)
    style_min, style_max = sv.min(0), sv.max(0)
    picks = [(0, 5), (1, 40), (0, 100)]

    want = models.counterfactual_images(
        latents, picks, k=3, style_min=style_min, style_max=style_max,
        shift_size=1.0, batch_size=2,
    )  # NHWC

    # reproduce the flip logic with the JAX path
    base = np.asarray(
        gen.call_synthesis(
            params, jnp.asarray(latents),
            style_delta=jnp.zeros((2, gen.total_style_coords)),
        )
    )
    base_prob = models.classify(base)
    delta = np.zeros((2, gen.total_style_coords), np.float32)
    for bi in range(2):
        flip = int(np.argmax(base_prob[bi])) == 0
        for direction, sindex in picks:
            to_min = (direction == 0) != flip
            extreme = style_min[sindex] if to_min else style_max[sindex]
            delta[bi, sindex] = extreme - sv[bi, sindex]
    got = np.asarray(
        gen.call_synthesis(params, jnp.asarray(latents), style_delta=jnp.asarray(delta))
    )
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_convert_adapts_to_perturbed_layouts():
    """Layout drift hardening (VERDICT r3 Next #8): the converter must adapt
    to keras-restored naming (dense.weights[0] / dense_bias.bias /
    convs[i].kernel) and to one level of extra nesting, producing identical
    params to the documented layout; a layout missing g_synthesis anywhere
    must fail pointing at describe_savedmodel."""
    twin = TwinGenerator(SPEC, seed=3)
    _, want = convert_google_generator(twin)

    for perturb in (perturb_keras_layout, perturb_nested_layout):
        gen_p, got = convert_google_generator(perturb(twin))
        assert gen_p.layer_shapes == SPEC.layer_shapes
        flat_w = jax.tree_util.tree_leaves(want)
        flat_g = jax.tree_util.tree_leaves(got)
        assert len(flat_w) == len(flat_g)
        for a, b in zip(flat_w, flat_g):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="describe_savedmodel"):
        convert_google_generator(perturb_broken_layout(twin))


def test_google_fid_topk_end_to_end(saved_root, models, tmp_path):
    rng = np.random.RandomState(2)
    n = 6
    latents = rng.randn(n, SPEC.dlatent_dim).astype(np.float32)
    originals = rng.rand(n, SPEC.image_size, SPEC.image_size, 3).astype(np.float32)
    picks = [(0, 5), (1, 40)]

    fids_tf = google_fid_topk(
        models, originals, latents, picks, k=2, batch_size=3,
        csv_path=str(tmp_path / "fid_results.csv"),
    )
    assert len(fids_tf) == 3 and all(np.isfinite(fids_tf))
    lines = (tmp_path / "fid_results.csv").read_text().strip().splitlines()
    assert lines[0] == "k,fid" and len(lines) == 4

    # converted-JAX generator path agrees
    jax_gen = convert_google_generator(saved_root / "generator.savedmodel")
    fids_jax = google_fid_topk(
        models, originals, latents, picks, k=2, batch_size=3,
        jax_generator=jax_gen,
    )
    np.testing.assert_allclose(fids_jax, fids_tf, rtol=0.05, atol=0.05)


def test_load_examples_tfrecord(tmp_path):
    path = tmp_path / "examples_1.tfrecord"
    C, num_classes = 7, 2
    want_lat = np.arange(4, dtype=np.float32)
    want_eff = np.arange(C * 2 * num_classes, dtype=np.float32)
    want_prob = np.array([0.3, 0.7], np.float32)
    with tf.io.TFRecordWriter(str(path)) as w:
        ex = tf.train.Example(features=tf.train.Features(feature={
            "dlatent": tf.train.Feature(
                float_list=tf.train.FloatList(value=want_lat)),
            "result": tf.train.Feature(
                float_list=tf.train.FloatList(value=want_eff)),
            "base_prob": tf.train.Feature(
                float_list=tf.train.FloatList(value=want_prob)),
        }))
        w.write(ex.SerializeToString())
    latents, effects, probs = load_examples_tfrecord(path, num_classes)
    assert latents.shape == (1, 4) and probs.shape == (1, 2)
    assert effects.shape == (1, 2, C, num_classes)
    # cell 7 transpose: stored (C, 2, classes) -> (2, C, classes)
    np.testing.assert_allclose(
        effects[0], want_eff.reshape(C, 2, num_classes).transpose(1, 0, 2)
    )
