"""End-to-end AttFind *ranking* parity vs the reference's literal pipeline.

VERDICT r2 "Missing #1" / "Next #2": the BASELINE north star is matching
top-k AttFind coordinates. This test composes the whole thing across both
implementations on one shared tiny model:

reference side (exec'd literal source, ``reference_notebook.py``):
  cell 5 ``attfind_extraction`` — the bias-mutation hot loop over
  (image x sindex x direction) with batch-1 forwards — then cells 14-16
  class split + greedy ``find_significant_styles`` + merge/score;

stylex_tpu side: ``attfind.extraction.attfind_extraction`` (batched
style-delta sweep with block-resume) + ``attfind.analysis`` on identical
images / noise / converted weights / an identical frozen classifier.

Asserts the raw effect tensors agree and the final ranked
(direction, sindex) lists match under tolerance-aware comparison (order
swaps allowed only between entries whose merge scores are closer than the
numeric agreement of the two effect tensors).

The reference loop hard-codes latent_dim 514 (cell 5:
``torch.zeros((num_images, 514))``), so the shared model uses the real
514/512 dims at image_size 16 / capacity 4 to keep the torch loop fast.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stylex_tpu.attfind.analysis import (
    find_significant_styles,
    merge_and_score,
    split_by_class,
)
from stylex_tpu.attfind.extraction import attfind_extraction
from stylex_tpu.config import ModelConfig
from stylex_tpu.models import build_stylex
from stylex_tpu.models.convert import convert_stylex_state_dict

from reference_notebook import run_reference_analysis, run_reference_attfind
from reference_src import ReferenceStylExContainer

IMAGE_SIZE = 16
CAP = 4
N_IMAGES = 6
NUM_INDICES = 5
EFFECT_THRESHOLD = 0.5  # cell 16; max_image_effect = 5x this


class _SharedClassifier:
    """One deterministic frozen classifier realised identically in torch and
    JAX: logits = 3 * tanh(<image, W>) + bias for a fixed random W — enough
    to make effects image- and coordinate-dependent without
    framework-specific ops. ``bias`` is calibrated once (before either
    pipeline runs) so the untrained generator's near-identical outputs still
    split into two argmax classes."""

    def __init__(self, image_size: int, seed: int = 11, bias: float = 0.0):
        rng = np.random.RandomState(seed)
        # (H, W, C, classes) layout; scaled so logits land in tanh's
        # responsive range
        self.w = (rng.randn(image_size, image_size, 3, 2) / (image_size * 2.0)).astype(
            np.float32
        )
        self._w_torch = torch.from_numpy(self.w)
        self.bias = float(bias)

    def _bias_torch(self) -> torch.Tensor:
        return torch.tensor([0.0, self.bias], dtype=torch.float32)

    # torch side (NCHW, like the reference classifiers' classify_images)
    def classify_images(self, images: torch.Tensor) -> torch.Tensor:
        raw = 3.0 * torch.tanh(torch.einsum("nchw,hwck->nk", images, self._w_torch))
        return raw + self._bias_torch()

    # JAX side (NHWC, stylex_tpu layout)
    def classify_images_jax(self, images: jax.Array) -> jax.Array:
        w = jnp.asarray(self.w, images.dtype)
        raw = 3.0 * jnp.tanh(jnp.einsum("nhwc,hwck->nk", images, w))
        return raw + jnp.asarray([0.0, self.bias], raw.dtype)


def _torch_generated_logits(ref, clf, images, noise):
    """Quick torch-side phase 1 (encode -> w -> generate -> classify), used
    only to calibrate the classifier bias."""
    from reference_src import load_reference_namespace

    ns = load_reference_namespace()
    out = []
    with torch.no_grad():
        for im in images:
            e = ref.encoder(im)
            e = e.unsqueeze(0) if e.dim() == 1 else e
            w = torch.cat((e, clf.classify_images(im)), dim=1)
            wt = ns["styles_def_to_tensor"]([(w, ref.G.num_layers)])
            g = ref.G(wt, noise)
            out.append(clf.classify_images(g))
    return torch.cat(out).numpy()


def _calibrate_bias(ref, images, noise) -> float:
    """Pick the class-1 bias whose argmax split over generated images is
    closest to half/half. The bias feeds back into w (logits are part of the
    conditioning), so this is a deterministic bisection on the realised
    class-1 count rather than a one-shot threshold."""
    n = len(images)

    def n_class1(b: float) -> int:
        lg = _torch_generated_logits(
            ref, _SharedClassifier(IMAGE_SIZE, bias=b), images, noise
        )
        return int((np.argmax(lg, axis=1) == 1).sum())

    lo, hi = -20.0, 20.0
    assert n_class1(lo) == 0 and n_class1(hi) == n, "bias range too narrow"
    best_b, best_err = None, n
    for _ in range(40):
        b = (lo + hi) / 2.0
        n1 = n_class1(b)
        if 0 < n1 < n and abs(n1 - n / 2) < best_err:
            best_b, best_err = b, abs(n1 - n / 2)
        if n1 < n / 2:
            lo = b
        else:
            hi = b
        if best_err == 0:
            break
    assert best_b is not None, "could not calibrate a non-degenerate split"
    return best_b


@pytest.fixture(scope="module")
def pipeline_outputs(tmp_path_factory):
    torch.manual_seed(0)
    ref = ReferenceStylExContainer(IMAGE_SIZE, 514, CAP, encoder_dim=512)
    ref.eval()
    cfg = ModelConfig(image_size=IMAGE_SIZE, network_capacity=CAP)
    modules = build_stylex(cfg)
    params = convert_stylex_state_dict(ref.state_dict(), cfg)
    C = modules.total_style_coords

    torch.manual_seed(5)
    images_t = [torch.rand(1, 3, IMAGE_SIZE, IMAGE_SIZE) for _ in range(N_IMAGES)]
    noise_t = torch.rand(1, IMAGE_SIZE, IMAGE_SIZE, 1)
    clf = _SharedClassifier(IMAGE_SIZE, bias=_calibrate_bias(ref, images_t, noise_t))

    out_dir = tmp_path_factory.mktemp("ref_attfind")
    ref_records = run_reference_attfind(
        stylex=ref,
        classifier=clf,
        images=images_t,
        noise=noise_t,
        num_style_coords=C,
        results_folder=str(out_dir),
        shift_size=1.0,
        image_size=IMAGE_SIZE,
    )

    images_np = np.concatenate(
        [im.numpy().transpose(0, 2, 3, 1) for im in images_t]
    ).astype(np.float32)
    ours = attfind_extraction(
        modules,
        params,
        clf.classify_images_jax,
        images_np,
        noise_t.numpy().astype(np.float32),
        shift_size=1.0,
        coord_batch=128,
        progress=False,
    )
    return ref_records, ours, C


def _merge_score(effect: np.ndarray, direction: int, sindex: int) -> float:
    other = 1 - direction
    return float(
        np.mean(effect[:, direction, sindex, 0]) + np.mean(effect[:, other, sindex, 1])
    )


def _assert_ranking_matches(got, want, effect, atol):
    """Exact match preferred; an order swap is tolerated only between
    entries whose merge scores are numerically indistinguishable."""
    assert set(got) == set(want), f"pick sets differ: {got} vs {want}"
    for g, w in zip(got, want):
        if tuple(g) != tuple(w):
            assert abs(_merge_score(effect, *g) - _merge_score(effect, *w)) < atol, (
                f"order mismatch beyond tolerance: {got} vs {want}"
            )


def test_effect_tensors_match(pipeline_outputs):
    ref_records, ours, C = pipeline_outputs
    want = ref_records["style_change"]
    got = ours.style_change
    assert got.shape == want.shape == (N_IMAGES, 2, C, 2)
    np.testing.assert_allclose(got, want, atol=2e-3)
    np.testing.assert_allclose(ours.base_prob, ref_records["base_prob"], atol=2e-3)
    np.testing.assert_allclose(
        ours.style_coordinates, ref_records["style_coordinates"], atol=2e-3
    )
    np.testing.assert_allclose(ours.minima, ref_records["minima"][0], atol=2e-3)
    np.testing.assert_allclose(ours.maxima, ref_records["maxima"][0], atol=2e-3)


def test_topk_ranking_matches_reference_pipeline(pipeline_outputs):
    """The headline: both full pipelines produce the same ranked
    (direction, sindex) top-k list."""
    ref_records, ours, C = pipeline_outputs

    ref_ranked = run_reference_analysis(
        ref_records["style_change"],
        ref_records["base_prob"],
        ref_records["latents"],
        num_indices=NUM_INDICES,
        effect_threshold=EFFECT_THRESHOLD,
    )

    labels = np.argmax(ours.base_prob, axis=1)
    assert len(set(labels.tolist())) == 2, "degenerate split; reseed the fixture"
    effects_cls, _, _, _ = split_by_class(
        ours.style_change,
        ours.latents,
        ours.base_prob,
        ours.style_coordinates,
        ours.minima,
        ours.maxima,
    )
    per_class = {
        ci: find_significant_styles(
            effects_cls[ci],
            NUM_INDICES,
            ci,
            max_image_effect=EFFECT_THRESHOLD * 5,
        )
        for ci in (0, 1)
    }
    our_ranked = merge_and_score(ours.style_change, per_class, NUM_INDICES)

    ref_top = [tuple(x) for x in ref_ranked[:NUM_INDICES]]
    our_top = [tuple(x) for x in our_ranked[:NUM_INDICES]]
    _assert_ranking_matches(our_top, ref_top, ref_records["style_change"], atol=5e-3)


def test_our_analysis_on_reference_records(pipeline_outputs):
    """Analysis-semantics parity in isolation: our greedy + merge on the
    REFERENCE's own effect tensor must equal the reference's analysis."""
    ref_records, _, _ = pipeline_outputs
    ref_ranked = run_reference_analysis(
        ref_records["style_change"],
        ref_records["base_prob"],
        ref_records["latents"],
        num_indices=NUM_INDICES,
        effect_threshold=EFFECT_THRESHOLD,
    )
    effects_cls, _, _, _ = split_by_class(
        ref_records["style_change"],
        ref_records["latents"],
        ref_records["base_prob"],
        ref_records["style_coordinates"],
        ref_records["minima"][0],
        ref_records["maxima"][0],
    )
    per_class = {
        ci: find_significant_styles(
            effects_cls[ci],
            NUM_INDICES,
            ci,
            max_image_effect=EFFECT_THRESHOLD * 5,
        )
        for ci in (0, 1)
    }
    ours = merge_and_score(ref_records["style_change"], per_class, NUM_INDICES)
    assert [tuple(x) for x in ours] == [tuple(x) for x in ref_ranked[:NUM_INDICES]]
