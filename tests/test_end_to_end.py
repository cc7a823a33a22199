"""Full-pipeline integration test: train -> checkpoint -> reload ->
AttFind -> analysis -> counterfactual FID, tiny config on CPU.

This is the whole reference workflow (cli.py training -> run_attfind
notebook -> FID notebook) in one pass.
"""

import numpy as np
import pytest

import jax

from stylex_tpu.config import ModelConfig, TrainConfig


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    from stylex_tpu.attfind import (
        attfind_extraction,
        find_significant_styles,
        merge_and_score,
        save_records_hdf5,
        split_by_class,
    )
    from stylex_tpu.eval.counterfactual import create_counterfactual_dataset, fid_topk
    from stylex_tpu.train.trainer import Trainer

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(
        batch_size=2, gradient_accumulate_every=2, aug_prob=0.0,
        save_every=2, evaluate_every=10**9,
    )
    trainer = Trainer(
        name="e2e", base_dir=str(tmp_path), model_cfg=cfg, train_cfg=tc,
        classifier_name="mobilenet",
    )
    trainer.set_data_src(dataset_name="synthetic")
    for _ in range(3):
        metrics = trainer.train()
    assert all(np.isfinite(v) for v in metrics.values())
    trainer.loader.close()

    # checkpoint + reload round trip through a fresh Trainer
    trainer.save(1)
    trainer2 = Trainer(
        name="e2e", base_dir=str(tmp_path), model_cfg=cfg, train_cfg=tc,
        classifier_name="mobilenet",
    )
    trainer2.load(-1)
    assert trainer2.steps >= 2

    # inference-only loads refuse to train (ADVICE r4: optimizer slots stay
    # host numpy, which would silently disable donation + force a recompile)
    trainer_inf = Trainer(
        name="e2e", base_dir=str(tmp_path), model_cfg=cfg, train_cfg=tc,
        classifier_name="mobilenet",
    )
    trainer_inf.load(-1, inference=True)
    trainer_inf.set_data_src(dataset_name="synthetic")
    with pytest.raises(RuntimeError, match="inference"):
        trainer_inf.train()
    trainer_inf.loader.close()
    trainer_inf.load(-1)  # a full reload clears the guard
    assert not trainer_inf._inference_only

    # evaluate grids from the reloaded model
    trainer2.evaluate(num=0)
    out = tmp_path / "results" / "e2e"
    assert (out / "0.png").exists() and (out / "0-ema.png").exists()

    # AttFind end to end
    modules, params = trainer2.modules, trainer2.full_params
    clf_fn = trainer2.classifier.classify_images
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3)))
    noise = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 1)))
    records = attfind_extraction(
        modules, params, clf_fn, images, noise, coord_batch=80, progress=False
    )
    save_records_hdf5(records, str(tmp_path / "records.hdf5"))

    effects_cls, *_ = split_by_class(
        records.style_change, records.latents, records.base_prob,
        records.style_coordinates, records.minima, records.maxima,
    )
    per_class = {}
    for cls in (0, 1):
        if len(effects_cls[cls]):
            per_class[cls] = find_significant_styles(effects_cls[cls], 2, cls, 100.0)
    ranked = merge_and_score(records.style_change, per_class, 2)
    assert len(ranked) >= 1
    direction, sindex = ranked[0]
    assert direction in (0, 1) and 0 <= sindex < modules.total_style_coords

    # counterfactual FID for the top pick
    fids = fid_topk(modules, params, clf_fn, records, ranked, k=1, batch_size=4)
    assert len(fids) == 2 and all(np.isfinite(f) for f in fids)


@pytest.mark.slow
def test_new_arch_encoder_eval_grids(tmp_path):
    """Regression: NEW-arch evaluate(encoder_input=True) must truncate the
    probability-free w and concat softmax probs AFTER truncation
    (`stylex_train_new.py:1738-1743`) — shapes differ (512 vs 514) so doing
    it in the wrong order crashes."""
    from stylex_tpu.config import Arch
    from stylex_tpu.train.trainer import Trainer

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34,
                      encoder_dim=32, arch=Arch.NEW)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=0.0,
                     save_every=10**9, evaluate_every=10**9, num_image_tiles=2)
    trainer = Trainer(
        name="e2e_new", base_dir=str(tmp_path), model_cfg=cfg, train_cfg=tc,
        classifier_name="mobilenet",
    )
    trainer.set_data_src(dataset_name="synthetic")
    trainer.evaluate(encoder_input=True, num=0)
    out = tmp_path / "results" / "e2e_new"
    assert (out / "0-from_encoder.png").exists()
    assert (out / "0.png").exists() and (out / "0-mr.png").exists()
    trainer.loader.close()
