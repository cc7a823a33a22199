"""Multi-step dispatch: K train steps fused into one lax.scan program.

The reference's host loop is one optimizer step per Python iteration
(`/root/reference/stylex/cli.py:71-76`); `steps_per_dispatch > 1` must be a
pure performance knob — identical randomness (pre-split sequential key
chain), identical data order, and boundary steps (save/evaluate/FID) always
ending a block so periodic host work fires exactly as in the sequential
loop.
"""

import csv

import numpy as np
import pytest

from stylex_tpu.config import ModelConfig, TrainConfig


def _make_trainer(tmp_path, name, steps_per_dispatch, save_every=10**6, **tc_kwargs):
    from stylex_tpu.train.trainer import Trainer

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(
        batch_size=2,
        gradient_accumulate_every=2,
        aug_prob=0.0,
        save_every=save_every,
        evaluate_every=10**9,
        steps_per_dispatch=steps_per_dispatch,
        **tc_kwargs,
    )
    trainer = Trainer(
        name=name, base_dir=str(tmp_path), model_cfg=cfg, train_cfg=tc,
        classifier_name="mobilenet",
    )
    trainer.set_data_src(dataset_name="synthetic")
    return trainer


@pytest.mark.slow
def test_multi_dispatch_matches_sequential(tmp_path):
    """4 steps at steps_per_dispatch=3 == 4 steps at 1 (same seed): the
    fused scan must consume the same batches and step keys, so parameters
    agree to float tolerance.

    The tolerance is loose-ish by design: the scan body and the standalone
    step are separately compiled XLA programs whose fusion order differs at
    the ulp level, and adversarial updates amplify that across steps — the
    equivalence being asserted is of *semantics* (same data, same keys,
    same schedule), not of instruction schedules."""
    import jax

    a = _make_trainer(tmp_path / "a", "seq", steps_per_dispatch=1)
    b = _make_trainer(tmp_path / "b", "fused", steps_per_dispatch=3)
    while a.steps < 4:
        a.train()
    # step 0 is a boundary (0 % 100 == 0 < 2500) so b's blocks are 1+3
    sizes = []
    while b.steps < 4:
        before = b.steps
        b.train()
        sizes.append(b.steps - before)
    assert sizes == [1, 3]
    assert a.steps == b.steps == 4

    pa = jax.device_get(a.full_params)
    pb = jax.device_get(b.full_params)
    flat_a, _ = jax.tree.flatten(pa)
    flat_b, _ = jax.tree.flatten(pb)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xa, np.float32), np.asarray(xb, np.float32),
            rtol=2e-2, atol=2e-3,
        )
    a.loader.close()
    b.loader.close()


@pytest.mark.slow
def test_blocks_clamp_to_boundaries_and_log_every_step(tmp_path):
    """save_every=4 with steps_per_dispatch=8: blocks must split so step 4
    (and 8) end their blocks, checkpoints are written at the reference
    cadence, and the metrics CSV still gets one row per executed step."""
    t = _make_trainer(tmp_path, "bounded", steps_per_dispatch=8, save_every=4)
    seen = []
    while t.steps < 9:
        before = t.steps
        t.train()
        seen.append((before, t.steps))
    # step 0 is a save boundary -> k=1; then 1..4 (4 is a boundary), 5..8
    assert seen == [(0, 1), (1, 5), (5, 9)]
    t.flush()  # saves are background writes; barrier before reading disk
    ckpt_dir = tmp_path / "models" / "bounded"
    assert (ckpt_dir / "model_0.ckpt").exists()  # step 0
    assert (ckpt_dir / "model_1.ckpt").exists()  # step 4
    assert (ckpt_dir / "model_2.ckpt").exists()  # step 8

    t.save(99)  # force a full drain so every step's metrics are flushed
    with open(tmp_path / "results" / "bounded" / "metrics.csv") as f:
        rows = list(csv.DictReader(f))
    assert [int(r["step"]) for r in rows] == list(range(9))
    assert all(np.isfinite(float(r["g_loss"])) for r in rows)
    t.loader.close()


@pytest.mark.slow
def test_metrics_lag_zero_is_synchronous(tmp_path):
    """``metrics_lag=0`` is documented as the reference's synchronous
    behavior (`config.py`): every train() drains its own step's metrics, so
    nothing stays in flight and the returned metrics are the step just run."""
    t = _make_trainer(tmp_path, "sync", steps_per_dispatch=1, metrics_lag=0)
    for _ in range(3):
        metrics = t.train()
        assert len(t._pending) == 0
        assert np.isfinite(metrics["g_loss"])
    # contrast: the pipelined default keeps metrics in flight after the
    # warm-up drain (first call drains fully because nothing was logged yet)
    p = _make_trainer(tmp_path, "pipelined", steps_per_dispatch=1, metrics_lag=8)
    p.train()
    p.train()
    assert len(p._pending) > 0
    t.loader.close()
    p.loader.close()


@pytest.mark.slow
def test_auto_aug_prob_rebuilds_step_after_load(tmp_path):
    """Default CLI ordering is load() (which jits the step) THEN
    set_data_src() (which auto-sets aug_prob for small datasets); the baked
    augmentation probability must follow, not stay at 0."""
    from stylex_tpu.train.trainer import Trainer

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=None,
                     save_every=10**6, evaluate_every=10**9)
    t = Trainer(name="aug", base_dir=str(tmp_path), model_cfg=cfg, train_cfg=tc,
                classifier_name="mobilenet")
    t.init_stylex()  # what load() does before any data source exists
    assert t._baked_aug_prob == 0.0
    t.set_data_src(dataset_name="synthetic")  # 512 images -> auto ~0.298
    assert t.aug_prob is not None and t.aug_prob > 0
    assert t._baked_aug_prob == t.aug_prob
    metrics = t.train()
    assert np.isfinite(metrics["g_loss"])
    t.loader.close()
