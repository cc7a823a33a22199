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


@pytest.mark.parametrize("h,w_sp", [(2, 2), (3, 3), (4, 4), (4, 7), (8, 8), (5, 3)])
def test_upsample2x_blur_fused_matches_composition(h, w_sp):
    """The separable polyphase upsample+blur (ops/blur.py) must equal
    blur3(upsample2x_bilinear(x)) EVERYWHERE — including the first/last
    fine row and column, where the blur's reflect padding composes with
    the upsample's edge clamp into the 2-tap closed forms. Also checks
    it against the reference torch composition directly."""
    from stylex_tpu.ops.blur import upsample2x_blur, upsample2x_blur_unfused

    rng = np.random.RandomState(h * 10 + w_sp)
    x = jnp.array(rng.randn(2, h, w_sp, 3).astype(np.float32))

    want = upsample2x_blur_unfused(x)
    got = upsample2x_blur(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)

    # torch oracle: nn.Upsample(bilinear, align_corners=False) then kornia-
    # style normalized [1,2,1]⊗[1,2,1] blur with reflect border
    # (`stylex_train.py:144-153,612-616`).
    xt = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    yt = F.interpolate(xt, scale_factor=2, mode="bilinear", align_corners=False)
    taps = torch.tensor([[1.0, 2.0, 1.0]])
    k2d = (taps.T @ taps) / 16.0
    yt = F.pad(yt, (1, 1, 1, 1), mode="reflect")
    wk = k2d.expand(xt.shape[1], 1, 3, 3)
    zt = F.conv2d(yt, wk, groups=xt.shape[1])
    np.testing.assert_allclose(
        np.asarray(got), zt.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )

    # linear op: autodiff transpose must match the unfused composition's
    g_fused = jax.grad(lambda v: (upsample2x_blur(v) ** 2).sum())(x)
    g_ref = jax.grad(lambda v: (upsample2x_blur_unfused(v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("h,w_sp", [(4, 4), (8, 8), (8, 12), (6, 4), (16, 16)])
def test_blur_conv3x3_down2_matches_composition(h, w_sp):
    """The fused blur+stride-2-conv (ops/downconv.py) must equal
    conv3x3_s2_p1(blur3(x)) EVERYWHERE — the o=0 output row/col crosses the
    blur/conv padding boundary and is recomputed from 3-wide strips; this
    is the test that the pasting is exact. Includes a torch oracle
    (reflect-pad blur + Conv2d(stride=2, padding=1),
    `stylex_train.py:733-736`) and the gradient w.r.t. the stored 3x3
    parameter."""
    from stylex_tpu.ops.blur import blur3_xla
    from stylex_tpu.ops.downconv import blur_conv3x3_down2

    rng = np.random.RandomState(h * 10 + w_sp)
    x = jnp.array(rng.randn(2, h, w_sp, 5).astype(np.float32))
    k = jnp.array(rng.randn(3, 3, 5, 4).astype(np.float32))

    want = jax.lax.conv_general_dilated(
        blur3_xla(x), k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    got = blur_conv3x3_down2(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    xt = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    taps = torch.tensor([[1.0, 2.0, 1.0]])
    k2d = (taps.T @ taps) / 16.0
    bt = F.conv2d(
        F.pad(xt, (1, 1, 1, 1), mode="reflect"),
        k2d.expand(5, 1, 3, 3),
        groups=5,
    )
    kt = torch.tensor(np.asarray(k).transpose(3, 2, 0, 1))
    zt = F.conv2d(bt, kt, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(got), zt.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )

    g_fused = jax.grad(lambda w: (blur_conv3x3_down2(x, w) ** 2).sum())(k)
    g_ref = jax.grad(
        lambda w: (
            jax.lax.conv_general_dilated(
                blur3_xla(x), w, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            ** 2
        ).sum()
    )(k)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


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
