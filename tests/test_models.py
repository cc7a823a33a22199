"""Model-level tests: shapes, StyleSpace bookkeeping, and the key AttFind
invariant — explicit style deltas must equal the reference's bias mutation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.config import Arch, ModelConfig
from stylex_tpu.models import (
    DiscriminatorE,
    Generator,
    StyleVectorizer,
    build_stylex,
    init_stylex_params,
    make_w,
    num_style_coords,
    sindex_to_block_and_offset,
    style_coord_dims,
)
from stylex_tpu.ops import expand_styles


def small_cfg(**kw):
    defaults = dict(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    defaults.update(kw)
    return ModelConfig(**defaults)


def test_style_coord_plan_matches_reference_64px():
    # 64px, capacity 16, fmap_max 512 -> 1024+768+384+192+96 = 2464
    # (run_attfind_combined.ipynb cell 7).
    dims = style_coord_dims(64, 16, 512)
    assert [i + o for i, o in dims] == [1024, 768, 384, 192, 96]
    assert num_style_coords(64, 16, 512) == 2464


def test_sindex_mapping_walks_blocks():
    assert sindex_to_block_and_offset(0, 64) == (0, 0)
    assert sindex_to_block_and_offset(1023, 64) == (0, 1023)
    assert sindex_to_block_and_offset(1024, 64) == (1, 0)
    assert sindex_to_block_and_offset(2463, 64) == (4, 95)
    with pytest.raises(IndexError):
        sindex_to_block_and_offset(2464, 64)


def test_generator_shapes_and_coords():
    cfg = small_cfg()
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity, fmap_max=cfg.fmap_max)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (2, G.num_layers, cfg.latent_dim))
    noise = jax.random.uniform(key, (2, 16, 16, 1))
    params = G.init(key, w, noise)
    rgb, coords = G.apply(params, w, noise)
    assert rgb.shape == (2, 16, 16, 3)
    assert coords.shape == (2, G.total_style_coords)


@pytest.mark.slow
def test_fused_resample_paths_match_unfused(monkeypatch):
    """One switch (STYLEX_TPU_NO_FUSED_UPCONV) restores the literal
    reference-shaped compute graph; the shipping fused resamplers (generator
    entry upconv, RGB skip upsample+blur, discriminator blur+downconv) must
    agree with it at model level."""
    cfg = small_cfg(image_size=32)
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity, fmap_max=cfg.fmap_max)
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (2, G.num_layers, cfg.latent_dim))
    noise = jax.random.uniform(key, (2, 32, 32, 1))
    gp = G.init(key, w, noise)

    D = DiscriminatorE(image_size=32, network_capacity=4, mode="disc")
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    dp = D.init(jax.random.PRNGKey(2), x)

    rgb_f, coords_f = G.apply(gp, w, noise)
    d_f = D.apply(dp, x)
    monkeypatch.setenv("STYLEX_TPU_NO_FUSED_UPCONV", "1")
    rgb_u, coords_u = G.apply(gp, w, noise)
    d_u = D.apply(dp, x)

    np.testing.assert_allclose(np.asarray(rgb_f), np.asarray(rgb_u), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(coords_f), np.asarray(coords_u), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_u), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_downconv_gate_mixed_channels(monkeypatch):
    """capacity 16 @ 32px gives D filters [64, 128, 256, 512]: the 64/128
    blocks take the fused 5x5 downconv, the 256/512 blocks the unfused
    blur+conv (the static cout<=128 HBM-vs-MXU gate in models/layers.py).
    Both mixes must equal the literal reference-shaped graph."""
    for mode, kw in (("disc", {}), ("encoder", {"encoder_dim": 64})):
        D = DiscriminatorE(image_size=32, network_capacity=16, mode=mode, **kw)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
        dp = D.init(jax.random.PRNGKey(2), x)
        got = D.apply(dp, x)
        monkeypatch.setenv("STYLEX_TPU_NO_FUSED_UPCONV", "1")
        want = D.apply(dp, x)
        monkeypatch.delenv("STYLEX_TPU_NO_FUSED_UPCONV")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )


def test_style_delta_equals_bias_mutation():
    """Adding a one-hot delta must reproduce the reference's in-place
    ``to_style{1,2}.bias += shift`` trick (run_attfind_combined.ipynb cell 5)."""
    cfg = small_cfg()
    G = Generator(cfg.image_size, cfg.latent_dim, cfg.network_capacity, fmap_max=cfg.fmap_max)
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (1, G.num_layers, cfg.latent_dim))
    noise = jax.random.uniform(key, (1, 16, 16, 1))
    variables = G.init(key, w, noise)

    dims = G.block_dims
    total = G.total_style_coords
    # One coordinate in style1 of block 1 and one in style2 of block 0.
    for sindex, shift in [(dims[0][0] + dims[0][1] + 3, 0.7), (dims[0][0] + 2, -1.3)]:
        delta = jnp.zeros((1, total)).at[0, sindex].set(shift)
        rgb_delta, coords_delta = G.apply(variables, w, noise, delta)

        block_idx, off = sindex_to_block_and_offset(sindex, cfg.image_size, cfg.network_capacity, cfg.fmap_max)
        in_ch = dims[block_idx][0]
        layer = "to_style1" if off < in_ch else "to_style2"
        idx = off if off < in_ch else off - in_ch
        mutated = jax.tree.map(lambda x: x, variables)
        bias = mutated["params"][f"block{block_idx}"][layer]["bias"]
        mutated["params"][f"block{block_idx}"][layer]["bias"] = bias.at[idx].add(shift)
        rgb_mut, coords_mut = G.apply(mutated, w, noise)

        np.testing.assert_allclose(np.asarray(rgb_delta), np.asarray(rgb_mut), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(coords_delta), np.asarray(coords_mut), rtol=1e-5, atol=1e-5)


def test_discriminator_modes():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (3, 16, 16, 3))
    for mode, expect in [("disc", (3,)), ("encoder", (3, 32))]:
        D = DiscriminatorE(16, network_capacity=4, mode=mode, encoder_dim=32)
        params = D.init(key, x)
        out = D.apply(params, x)
        assert out.shape == expect

    D = DiscriminatorE(16, network_capacity=4, mode="cond_disc", num_classes=2)
    probs = jnp.array([[0.3, 0.7]] * 3)
    params = D.init(key, x, probs)
    out = D.apply(params, x, probs)
    assert out.shape == (3,)


def test_mapping_network():
    S = StyleVectorizer(32, depth=3, lr_mul=0.1)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (4, 32))
    params = S.init(key, z)
    w = S.apply(params, z)
    assert w.shape == (4, 32)
    # scale invariance from the input L2 normalisation
    w2 = S.apply(params, z * 10.0)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w2), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("arch", [Arch.OLD, Arch.NEW])
def test_stylex_bundle_end_to_end(arch):
    cfg = small_cfg(arch=arch)
    modules = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(0), modules)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    logits = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.num_classes))

    enc = modules.encode(params, imgs)
    assert enc.shape == (2, cfg.encoder_dim)
    w = make_w(cfg, enc, logits)
    assert w.shape == (2, cfg.latent_dim)
    w_styles = expand_styles(w, modules.num_layers)
    noise = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 1))
    rgb, coords = modules.generate(params, w_styles, noise)
    assert rgb.shape == (2, 16, 16, 3)
    assert coords.shape == (2, modules.total_style_coords)
    probs = jax.nn.softmax(logits, axis=-1)
    scores = modules.discriminate(params, rgb, probs)
    assert scores.shape == (2,)
    # EMA nets start identical to the live nets.
    rgb_ema, _ = modules.generate(params, w_styles, noise, ema=True)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ema), rtol=1e-6, atol=1e-6)
