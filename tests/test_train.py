"""Training engine tests: schedule, loss oracles, two live steps, checkpoint
round-trip, EMA cadence."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from stylex_tpu.config import Arch, ModelConfig, TrainConfig
from stylex_tpu.losses import (
    classifier_kl_loss,
    d_hinge_loss,
    dual_contrastive_loss,
    g_hinge_loss,
)
from stylex_tpu.models import build_stylex
from stylex_tpu.models.classifiers import build_classifier
from stylex_tpu.models.lpips import init_lpips_params
from stylex_tpu.train.state import create_train_state
from stylex_tpu.train.steps import make_train_step, microbatch_schedule
from stylex_tpu.utils.checkpoint import load_checkpoint, save_checkpoint, latest_checkpoint


def test_microbatch_schedule():
    np.testing.assert_array_equal(
        np.asarray(microbatch_schedule(4, True)), [False, True, False, True]
    )
    np.testing.assert_array_equal(np.asarray(microbatch_schedule(3, False)), [True] * 3)


def test_hinge_losses_match_torch():
    rng = np.random.RandomState(0)
    real = rng.randn(8).astype(np.float32)
    fake = rng.randn(8).astype(np.float32)
    want_d = (tF.relu(1 + torch.tensor(real)) + tF.relu(1 - torch.tensor(fake))).mean().item()
    assert np.isclose(float(d_hinge_loss(jnp.array(real), jnp.array(fake))), want_d, atol=1e-6)
    assert np.isclose(float(g_hinge_loss(jnp.array(fake))), fake.mean(), atol=1e-6)


def test_kl_loss_matches_torch_kldiv():
    rng = np.random.RandomState(1)
    real = rng.randn(6, 2).astype(np.float32)
    fake = rng.randn(6, 2).astype(np.float32)
    want = torch.nn.KLDivLoss(reduction="batchmean", log_target=True)(
        tF.log_softmax(torch.tensor(fake), dim=1), tF.log_softmax(torch.tensor(real), dim=1)
    ).item()
    got = float(classifier_kl_loss(jnp.array(real), jnp.array(fake)))
    assert np.isclose(got, want, atol=1e-5)


def test_dual_contrastive_matches_torch():
    rng = np.random.RandomState(2)
    real = rng.randn(5).astype(np.float32)
    fake = rng.randn(5).astype(np.float32)

    def torch_half(t1, t2):
        t1 = t1.reshape(-1, 1)
        t2 = t2.repeat(t1.shape[0], 1)
        t = torch.cat([t1, t2], dim=-1)
        return tF.cross_entropy(t, torch.zeros(t1.shape[0], dtype=torch.long))

    tr, tf_ = torch.tensor(real), torch.tensor(fake)
    want = (torch_half(tr, tf_) + torch_half(-tf_, -tr)).item()
    got = float(dual_contrastive_loss(jnp.array(real), jnp.array(fake)))
    assert np.isclose(got, want, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_train():
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=0.0)
    modules = build_stylex(cfg)
    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx))
    batch = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (2, 2, 16, 16, 3))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    return cfg, tc, modules, state, step, batch


@pytest.mark.slow
def test_two_steps_update_params_and_stay_finite(tiny_train):
    cfg, tc, modules, state, step, batch = tiny_train
    g0 = np.asarray(jax.tree.leaves(state.params["G"])[0])
    state, m1 = step(state, batch, jax.random.PRNGKey(10))
    state, m2 = step(state, batch, jax.random.PRNGKey(11))
    assert int(state.step) == 2
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    g2 = np.asarray(jax.tree.leaves(state.params["G"])[0])
    assert not np.allclose(g0, g2), "G params did not change"
    # EMA untouched before ema_start_step
    se = np.asarray(jax.tree.leaves(state.ema_params["SE"])[0])
    s_init = np.asarray(jax.tree.leaves(state.params["S"])[0])
    assert not np.allclose(se, s_init)  # live moved, EMA stayed


def _fused_vs_scan_case(arch, cfg_kwargs, tc_kwargs, accum):
    """The fused (wide) step must equal the literal accumulation scan on
    identical state/batch/key: the RNG chain is replayed exactly and sums of
    per-micro-batch means become means over equal groups, so the only
    differences are float reassociation.

    Compared under SGD, not Adam: with SGD the param diff is lr * grad diff,
    a direct gradient comparison. Adam normalises by sqrt(v), so on
    coordinates whose gradient is ~0 (e.g. D biases under the relativistic
    shift) reassociation noise flips the update's *sign* — an intrinsic
    optimizer property, not a semantics difference (observed: 5/128 bias
    elements off by ~1e-4 with matching losses). Adam integration is covered
    by test_two_steps_update_params_and_stay_finite and the end-to-end
    suite."""
    import optax

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34,
                      encoder_dim=32, arch=arch, **cfg_kwargs)
    modules = build_stylex(cfg)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    batch = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (accum, 2, 16, 16, 3))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    results = {}
    for fused in (False, True):
        # pl_start_step=-1/pl_every=1 force the PL branch live; GP fires at
        # step 0 anyway — so every penalty path is compared, not just hinge.
        tc = TrainConfig(batch_size=2, gradient_accumulate_every=accum,
                         aug_prob=0.25,
                         fused_microbatches=fused, pl_start_step=-1, pl_every=1,
                         **tc_kwargs)
        state, _, _ = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
        g_tx = d_tx = optax.sgd(1e-2)
        state = state.replace(
            pl_mean=jnp.asarray(1.0),
            g_opt_state=g_tx.init({k: state.params[k] for k in ("encoder", "S", "G")}),
            d_opt_state=d_tx.init(state.params["D"]),
        )
        step = jax.jit(make_train_step(
            modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx,
        ))
        b = dict(batch)
        if tc.dual_contrast_loss:
            b["g_real"] = jax.random.uniform(jax.random.PRNGKey(9),
                                             (accum, 2, 16, 16, 3))
        if tc.top_k_training:
            b["top_k"] = jnp.asarray(1, jnp.int32)
        results[fused] = step(state, b, jax.random.PRNGKey(2))

    (s_scan, m_scan), (s_wide, m_wide) = results[False], results[True]
    for k in m_scan:
        np.testing.assert_allclose(
            float(m_scan[k]), float(m_wide[k]), rtol=2e-4, atol=1e-5,
            err_msg=f"metric {k}",
        )
    flat_a, _ = jax.tree_util.tree_flatten_with_path(s_scan.params)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(s_wide.params)
    for (path, a), (_, b_) in zip(flat_a, flat_b):
        # SGD: params diff == lr * grad diff -> direct gradient comparison
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_microbatches_match_scan_fast():
    """ADVICE r4 (medium): fused_microbatches=True is the shipping default
    training path, so at least one fused-vs-scan equivalence case must run
    in the FAST profile — tiny config, accum=2."""
    _fused_vs_scan_case(Arch.OLD, {}, {}, accum=2)


@pytest.mark.slow
@pytest.mark.parametrize(
    "arch,cfg_kwargs,tc_kwargs",
    [
        (Arch.OLD, {}, {}),
        (Arch.NEW, {}, {"kl_rec_during_disc": True}),
        (Arch.OLD, {}, {"rel_disc_loss": True, "top_k_training": True}),
        (Arch.OLD, {}, {"dual_contrast_loss": True}),
        (Arch.OLD, {}, {"cl_reg": True}),
        (Arch.OLD, {}, {"alternating_training": False}),
        # ADVICE r4: VQ layers in D — the wide step's q_loss group-mean
        # scaling (2*sum of VQ means over 2*accum*B) vs the scan's
        # per-micro-batch sum/accum, and the VQ/GP interaction
        (Arch.OLD, {"fq_layers": (1,), "fq_dict_size": 32}, {}),
    ],
)
def test_fused_microbatches_match_scan(arch, cfg_kwargs, tc_kwargs):
    _fused_vs_scan_case(arch, cfg_kwargs, tc_kwargs, accum=4)


@pytest.mark.slow
def test_checkpoint_roundtrip(tiny_train, tmp_path):
    cfg, tc, modules, state, step, batch = tiny_train
    state, _ = step(state, batch, jax.random.PRNGKey(12))
    path = save_checkpoint(str(tmp_path), "m", 3, state)
    found = latest_checkpoint(str(tmp_path), "m")
    assert found is not None and found[0] == 3
    zero_state = jax.tree.map(jnp.zeros_like, state)
    restored = load_checkpoint(path, zero_state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert int(restored.step) == int(state.step)


def test_pl_boundary_activation_and_cadence(tiny_train):
    """Pin the path-length penalty's activation step and every-32 cadence
    (VERDICT r4 Next #4; reference `stylex_train.py:1273,1422-1429`):
    ``apply_pl = (step > 5000) & (step % 32 == 0)`` — strictly greater, so
    step 5000 itself never fires; the first firing step is 5024, then every
    32. The -1 sentinel pl_mean seeds directly from the first measured mean
    path length, then follows EMA(0.99). ``step`` is a traced scalar, so
    every probe reuses the one compiled program."""
    cfg, tc, modules, state, step, batch = tiny_train
    assert tc.pl_start_step == 5000 and tc.pl_every == 32  # reference cadence

    def probe(s, st):
        st = st.replace(step=jnp.asarray(s, jnp.int32))
        return step(st, batch, jax.random.PRNGKey(0))

    assert float(state.pl_mean) == -1.0  # never-activated sentinel
    # 5000 is NOT > 5000; 5023 misses the %32 grid: sentinel survives both
    for s in (5000, 5023):
        st, m = probe(s, state)
        assert float(st.pl_mean) == -1.0, s
        assert float(m["pl_mean"]) == -1.0, s
    # 5024 = first step past the boundary on the 32-grid: pl_mean seeds
    # from the measured mean path length (>= 0, finite)
    st, m = probe(5024, state)
    seeded = float(st.pl_mean)
    assert seeded >= 0.0 and np.isfinite(seeded)
    # off-grid steps keep it frozen...
    st2, _ = probe(5025, st)
    assert float(st2.pl_mean) == seeded
    # ...and the next on-grid step applies the EMA(0.99) update
    st3, _ = probe(5056, st2)
    moved = float(st3.pl_mean)
    assert moved != seeded and np.isfinite(moved)
    # EMA form: new = 0.99*old + 0.01*len  =>  len = (new - 0.99*old)/0.01
    implied_len = (moved - 0.99 * seeded) / 0.01
    assert implied_len >= 0.0


def test_checkpoint_restore_returns_device_arrays(tiny_train, tmp_path):
    """Restored leaves must be committed jax arrays (template dtype +
    sharding), not host numpy — numpy leaves silently disable state
    donation on the jitted step and force a resume-time recompile."""
    cfg, tc, modules, state, step, batch = tiny_train
    from stylex_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    p = save_checkpoint(str(tmp_path), "t", 1, state)
    restored = load_checkpoint(p, state)
    for t, v in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        if hasattr(t, "dtype"):
            assert isinstance(v, jax.Array), type(v)
            assert v.dtype == t.dtype
