"""Multi-device tests on the virtual 8-CPU mesh: sharded AttFind sweeps and
the data-parallel train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.attfind import attfind_extraction
from stylex_tpu.config import Arch, ModelConfig, TrainConfig
from stylex_tpu.models import build_stylex, init_stylex_params
from stylex_tpu.models.classifiers import build_classifier
from stylex_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_batch


requires_8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


@requires_8
def test_attfind_sharded_matches_single_device():
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    modules = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(0), modules)
    clf = build_classifier("mobilenet", cfg.image_size)
    images = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3)))
    noise = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 1)))

    mesh = make_mesh(8)
    sharded = attfind_extraction(
        modules, params, clf.classify_images, images, noise,
        coord_batch=64, mesh=mesh, progress=False,
    )
    single = attfind_extraction(
        modules, params, clf.classify_images, images, noise,
        coord_batch=64, progress=False,
    )
    np.testing.assert_allclose(
        sharded.style_change, single.style_change, rtol=1e-4, atol=1e-5
    )


@requires_8
def test_train_step_data_parallel_runs():
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32,
                      arch=Arch.NEW)
    tc = TrainConfig(batch_size=8, gradient_accumulate_every=2, aug_prob=0.0)
    modules = build_stylex(cfg)

    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step

    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    mesh = make_mesh(8)
    step = jax.jit(
        make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx),
        in_shardings=(replicated(mesh), None, None),
    )
    batch = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (2, 8, 16, 16, 3))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    batch = shard_batch(mesh, batch, batch_axis=1)
    state = jax.device_put(state, replicated(mesh))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


@requires_8
def test_train_step_accepts_single_device_committed_state():
    """The Trainer passes ``init_on_host`` output (committed to device 0)
    straight into the mesh-jitted step; the explicit ``in_shardings`` must
    reshard it rather than raise the incompatible-devices error."""
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=8, gradient_accumulate_every=2, aug_prob=0.0)
    modules = build_stylex(cfg)

    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step

    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    mesh = make_mesh(8)
    step = jax.jit(
        make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx),
        in_shardings=(replicated(mesh), None, None),
    )
    batch = {
        k: jax.random.uniform(jax.random.PRNGKey(i), (2, 8, 16, 16, 3))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    batch = shard_batch(mesh, batch, batch_axis=1)
    # commit the whole state to ONE device (what init_on_host produces on a
    # non-CPU default backend) — no replicated re-put
    state = jax.device_put(state, jax.devices()[0])
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 1
    assert state.pl_mean.sharding.is_equivalent_to(replicated(mesh), ndim=0)
