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


@pytest.mark.slow
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
@pytest.mark.slow
def test_train_step_sharded_matches_single_device():
    """Numerical equivalence (VERDICT r3 Next #4): the 8-device data-parallel
    step must produce the same new state as the single-device step on
    identical inputs — sharding only changes reduction *placement* (psum over
    the mesh vs one local sum), not semantics. JAX's threefry RNG is
    sharding-invariant, so every random draw (noise, mixing, DiffAugment)
    matches by construction; remaining differences are float reassociation."""
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32,
                      arch=Arch.NEW)
    tc = TrainConfig(batch_size=8, gradient_accumulate_every=2, aug_prob=0.25)
    modules = build_stylex(cfg)

    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step

    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    step_fn = make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx)
    batch = {
        k: np.asarray(jax.random.uniform(jax.random.PRNGKey(i), (2, 8, 16, 16, 3)))
        for i, k in enumerate(("d_real", "d_enc", "g_imgs"))
    }
    key = jax.random.PRNGKey(2)

    # single device: everything on device 0
    dev0 = jax.devices()[0]
    s1, m1 = jax.jit(step_fn)(
        jax.device_put(state, dev0),
        jax.device_put(batch, dev0),
        key,
    )

    # 8-device mesh: replicated params, batch sharded over 'data'
    mesh = make_mesh(8)
    sharded_step = jax.jit(step_fn, in_shardings=(replicated(mesh), None, None))
    s8, m8 = sharded_step(
        jax.device_put(state, replicated(mesh)),
        shard_batch(mesh, batch, batch_axis=1),
        key,
    )

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-3, atol=1e-5, err_msg=f"metric {k}"
        )
    flat1, _ = jax.tree_util.tree_flatten_with_path(s1.params)
    flat8, _ = jax.tree_util.tree_flatten_with_path(s8.params)
    assert len(flat1) == len(flat8)
    for (path, a), (_, b) in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
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
