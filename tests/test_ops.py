"""Unit tests for the core TPU ops against independent torch/numpy references.

The torch references here re-state the *published* StyleGAN2 math (weight
modulation/demodulation, binomial blur) so the TPU formulations can be
checked for numerical equivalence; they are test oracles, not ports.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from stylex_tpu.ops import (
    blur3,
    modulated_conv2d,
    upsample2x_bilinear,
    lpips_normalize,
    mixed_w_styles,
    expand_styles,
    slerp,
    diff_augment,
    augment_for_discriminator,
)


def torch_modconv(x_nchw, w_oikk, style, demod=True, eps=1e-8):
    """Oracle: per-sample modulated conv via explicit batched weights."""
    b = x_nchw.shape[0]
    out_ch = w_oikk.shape[0]
    weights = w_oikk[None] * (style[:, None, :, None, None] + 1.0)
    if demod:
        d = torch.rsqrt((weights**2).sum(dim=(2, 3, 4), keepdim=True) + eps)
        weights = weights * d
    k = w_oikk.shape[-1]
    pad = (k - 1) // 2
    x = x_nchw.reshape(1, -1, *x_nchw.shape[2:])
    weights = weights.reshape(b * out_ch, *w_oikk.shape[1:])
    y = F.conv2d(x, weights, padding=pad, groups=b)
    return y.reshape(b, out_ch, *x_nchw.shape[2:])


@pytest.mark.parametrize("demod", [True, False])
@pytest.mark.parametrize("kernel", [1, 3])
def test_modulated_conv_matches_grouped_conv_oracle(demod, kernel):
    rng = np.random.RandomState(0)
    b, h, w, cin, cout = 3, 8, 8, 5, 7
    x = rng.randn(b, h, w, cin).astype(np.float32)
    weight = rng.randn(kernel, kernel, cin, cout).astype(np.float32)
    style = rng.randn(b, cin).astype(np.float32)

    got = modulated_conv2d(jnp.array(x), jnp.array(weight), jnp.array(style), demod=demod)

    x_t = torch.tensor(x).permute(0, 3, 1, 2)
    w_t = torch.tensor(weight).permute(3, 2, 0, 1)  # HWIO -> OIHW
    want = torch_modconv(x_t, w_t, torch.tensor(style), demod=demod)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_blur3_matches_reflect_padded_oracle():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 6, 3).astype(np.float32)
    got = np.asarray(blur3(jnp.array(x)))

    taps = np.outer([1, 2, 1], [1, 2, 1]).astype(np.float32) / 16.0
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    want = np.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            want += taps[dy, dx] * xp[:, dy : dy + 6, dx : dx + 6, :]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upsample2x_matches_torch_bilinear():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    got = np.asarray(upsample2x_bilinear(jnp.array(x)))
    want = (
        F.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear", align_corners=False
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lpips_normalize_range():
    rng = np.random.RandomState(3)
    x = jnp.array(rng.rand(4, 8, 8, 3).astype(np.float32))
    y = np.asarray(lpips_normalize(x))
    assert np.allclose(y.min(axis=(1, 2, 3)), -1.0, atol=1e-6)
    assert np.allclose(y.max(axis=(1, 2, 3)), 1.0, atol=1e-6)


def test_mixed_w_styles_segments():
    w1 = jnp.ones((2, 4)) * 1.0
    w2 = jnp.ones((2, 4)) * 2.0
    out = mixed_w_styles(w1, w2, cutoff=2, num_layers=5)
    assert out.shape == (2, 5, 4)
    np.testing.assert_allclose(np.asarray(out[:, :2]), 1.0)
    np.testing.assert_allclose(np.asarray(out[:, 2:]), 2.0)
    np.testing.assert_allclose(np.asarray(expand_styles(w1, 3)), 1.0)


def test_slerp_endpoints():
    rng = np.random.RandomState(4)
    low = jnp.array(rng.randn(3, 8).astype(np.float32))
    high = jnp.array(rng.randn(3, 8).astype(np.float32))
    np.testing.assert_allclose(np.asarray(slerp(0.0, low, high)), np.asarray(low), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(slerp(1.0, low, high)), np.asarray(high), rtol=1e-4, atol=1e-5)


def test_diffaug_translation_and_cutout():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4, 16, 16, 3))
    out = diff_augment(key, x, ["translation"])
    assert out.shape == x.shape
    vals = np.unique(np.round(np.asarray(out), 6))
    assert set(vals).issubset({0.0, 1.0})

    out = diff_augment(key, x, ["cutout"])
    frac_zero = float((np.asarray(out) == 0).mean())
    # 8x8 cutout in 16x16 zeros at most 25% of pixels (less when clamped).
    assert 0.0 < frac_zero <= 0.25 + 1e-6

    out = diff_augment(key, x, ["brightness", "saturation", "contrast"])
    assert out.shape == x.shape


def test_diffaug_deterministic_per_key():
    key = jax.random.PRNGKey(7)
    x = jnp.array(np.random.RandomState(5).rand(2, 8, 8, 3).astype(np.float32))
    a = diff_augment(key, x, ["translation", "cutout"])
    b = diff_augment(key, x, ["translation", "cutout"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augment_for_discriminator_prob_zero_is_identity():
    key = jax.random.PRNGKey(0)
    x = jnp.array(np.random.RandomState(6).rand(2, 8, 8, 3).astype(np.float32))
    out = augment_for_discriminator(key, x, 0.0, ("translation",))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


@pytest.mark.parametrize("h,w_sp", [(3, 3), (4, 4), (4, 7), (8, 8), (5, 3)])
def test_upsample2x_conv3x3_matches_unfused(h, w_sp):
    """The polyphase fused upsample+conv (ops/upconv.py) must equal
    conv3x3_SAME(upsample2x_bilinear(x)) EVERYWHERE — borders included
    (the fused interior formula is invalid in a 2-fine-pixel frame which
    is recomputed from coarse strips; this is the test that the pasting
    is exact)."""
    from stylex_tpu.ops.upconv import upsample2x_conv3x3_same

    rng = np.random.RandomState(h * 10 + w_sp)
    x = jnp.array(rng.randn(2, h, w_sp, 5).astype(np.float32))
    k = jnp.array(rng.randn(3, 3, 5, 4).astype(np.float32))

    y = jax.image.resize(x, (2, 2 * h, 2 * w_sp, 5), method="bilinear")
    want = jax.lax.conv_general_dilated(
        y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = upsample2x_conv3x3_same(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_modulated_upsample_conv2d_matches_composition():
    """modulated_upsample_conv2d == upsample then modulated_conv2d, and
    gradients flow to the fine kernel parameterisation."""
    from stylex_tpu.ops import modulated_upsample_conv2d

    rng = np.random.RandomState(7)
    x = jnp.array(rng.randn(3, 6, 6, 8).astype(np.float32))
    k = jnp.array(rng.randn(3, 3, 8, 4).astype(np.float32))
    style = jnp.array(rng.randn(3, 8).astype(np.float32))

    want = modulated_conv2d(upsample2x_bilinear(x), k, style)
    got = modulated_upsample_conv2d(x, k, style)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    g_fused = jax.grad(lambda w: modulated_upsample_conv2d(x, w, style).sum())(k)
    g_ref = jax.grad(lambda w: modulated_conv2d(upsample2x_bilinear(x), w, style).sum())(k)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-3, atol=1e-4)
