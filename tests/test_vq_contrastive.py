"""VQ, fq-layer discriminator, and contrastive-regulariser tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.losses.contrastive import contrastive_d_loss, nt_xent_loss
from stylex_tpu.models.discriminator import DiscriminatorE
from stylex_tpu.ops.vq import init_vq_state, vector_quantize


def test_vector_quantize_basics():
    state = init_vq_state(jax.random.PRNGKey(0), dim=8, n_codes=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 8))
    q, idx, loss, new_state = vector_quantize(state, x)
    assert q.shape == x.shape
    assert idx.shape == (4, 2, 2)
    assert float(loss) > 0
    # straight-through: gradient of sum(q) wrt x is ones
    g = jax.grad(lambda xx: jnp.sum(vector_quantize(state, xx)[0]))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)
    # EMA update moved the codebook toward the data
    assert not np.allclose(np.asarray(new_state.codebook), np.asarray(state.codebook))
    # repeated quantization against updated codebook shrinks the loss
    for _ in range(20):
        _, _, loss2, new_state = vector_quantize(new_state, x)
    assert float(loss2) < float(loss)


def test_discriminator_with_fq_layers():
    D = DiscriminatorE(16, network_capacity=4, fq_layers=(2,), fq_dict_size=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = D.init(jax.random.PRNGKey(1), x)
    assert "vq" in variables
    out, updates = D.apply(variables, x, mutable=["vq", "intermediates"])
    assert out.shape == (2,)
    q_losses = jax.tree.leaves(updates["intermediates"])
    assert len(q_losses) == 1 and float(q_losses[0]) >= 0
    # EMA codebook moved
    before = jax.tree.leaves(variables["vq"])[0]
    after = jax.tree.leaves(updates["vq"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_nt_xent_prefers_aligned_views():
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    aligned = float(nt_xent_loss(h, h + 0.01 * rng.randn(8, 16).astype(np.float32)))
    shuffled = float(nt_xent_loss(h, jnp.asarray(rng.randn(8, 16).astype(np.float32))))
    assert aligned < shuffled


def test_contrastive_d_loss_runs():
    D = DiscriminatorE(16, network_capacity=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3))
    variables = D.init(jax.random.PRNGKey(1), x)
    feats = lambda im: D.apply(variables, im, return_features=True)
    loss = contrastive_d_loss(feats, jax.random.PRNGKey(2), x)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_fq_train_step_updates_codebook():
    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.classifiers import build_classifier
    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34,
                      encoder_dim=32, fq_layers=(2,), fq_dict_size=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=0.1)
    modules = build_stylex(cfg)
    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    assert "D_vq" in state.params
    # the encoder shares the fq trunk config (`stylex_train.py:923-925`)
    assert "E_vq" in state.params
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx))
    batch = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (2, 2, 16, 16, 3))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    book0 = np.asarray(jax.tree.leaves(state.params["D_vq"])[0])
    ebook0 = np.asarray(jax.tree.leaves(state.params["E_vq"])[0])
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    book1 = np.asarray(jax.tree.leaves(state.params["D_vq"])[0])
    assert not np.allclose(book0, book1)
    ebook1 = np.asarray(jax.tree.leaves(state.params["E_vq"])[0])
    assert not np.allclose(ebook0, ebook1)
    # the fq commitment loss must surface in metrics (reference's Q field,
    # `stylex_train.py:1700-1715`)
    assert "q_loss" in metrics and float(metrics["q_loss"]) != 0.0


@pytest.mark.slow
def test_cl_reg_metrics_and_print_line():
    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.classifiers import build_classifier
    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step
    from stylex_tpu.utils.logging import MetricLogger

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=0.1, cl_reg=True)
    modules = build_stylex(cfg)
    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx))
    batch = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (2, 2, 16, 16, 3))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "cr_loss" in metrics and np.isfinite(float(metrics["cr_loss"]))
    assert float(metrics["cr_loss"]) != 0.0
    line = MetricLogger().print_line(
        1, {k: float(v) for k, v in metrics.items()}
    )
    assert "CR:" in line


@pytest.mark.slow
def test_cl_reg_with_fq_layers_runs():
    """cl_reg's feature pass must supply the 'vq' collection when quantize
    layers are configured — the combination used to crash at first trace
    with ScopeCollectionNotFound."""
    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.classifiers import build_classifier
    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34,
                      encoder_dim=32, fq_layers=(2,), fq_dict_size=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=0.1,
                     cl_reg=True)
    modules = build_stylex(cfg)
    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx))
    batch = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (2, 2, 16, 16, 3))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert float(metrics["q_loss"]) != 0.0
    assert float(metrics["cr_loss"]) != 0.0
