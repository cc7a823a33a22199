"""Golden parity: a torch oracle StylEx (written here from the published
StyleGAN2/StylEx architecture) -> state dict -> converter -> our flax nets
must reproduce the oracle's outputs numerically.

This is the SURVEY §7 "golden test": it validates every layout conversion
(linear/conv transposes, modulated-conv weights, fc flatten permutation) and
every faithfully-kept quirk (noise spatial transpose, blur reflect padding,
(style+1) modulation, hinge trunk) in one shot.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from stylex_tpu.config import ModelConfig
from stylex_tpu.models import build_stylex
from stylex_tpu.models.convert import convert_stylex_state_dict
from stylex_tpu.ops.latents import expand_styles

IMAGE_SIZE = 16
CAP = 4
LATENT = 34


class TEqualLinear(tnn.Module):
    def __init__(self, dim_in, dim_out, lr_mul=0.1):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(dim_out, dim_in))
        self.bias = tnn.Parameter(torch.randn(dim_out) * 0.1)
        self.lr_mul = lr_mul

    def forward(self, x):
        return tF.linear(x, self.weight * self.lr_mul, self.bias * self.lr_mul)


class TMapping(tnn.Module):
    def __init__(self, emb, depth=3, lr_mul=0.1):
        super().__init__()
        layers = []
        for _ in range(depth):
            layers += [TEqualLinear(emb, emb, lr_mul), tnn.LeakyReLU(0.2)]
        self.net = tnn.Sequential(*layers)

    def forward(self, z):
        return self.net(tF.normalize(z, dim=1))


def t_blur(x):
    f = torch.tensor([1.0, 2.0, 1.0])
    k = (f[:, None] * f[None, :]) / 16.0
    k = k.expand(x.shape[1], 1, 3, 3)
    x = tF.pad(x, (1, 1, 1, 1), mode="reflect")
    return tF.conv2d(x, k, groups=x.shape[1])


class TConv2DMod(tnn.Module):
    def __init__(self, cin, cout, kernel, demod=True):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(cout, cin, kernel, kernel) * 0.2)
        self.demod = demod
        self.kernel = kernel

    def forward(self, x, style):
        b, c, h, w = x.shape
        weights = self.weight[None] * (style[:, None, :, None, None] + 1.0)
        if self.demod:
            d = torch.rsqrt((weights**2).sum(dim=(2, 3, 4), keepdim=True) + 1e-8)
            weights = weights * d
        x = x.reshape(1, -1, h, w)
        weights = weights.reshape(-1, c, self.kernel, self.kernel)
        x = tF.conv2d(x, weights, padding=(self.kernel - 1) // 2, groups=b)
        return x.reshape(b, -1, h, w)


class TRGB(tnn.Module):
    def __init__(self, latent, cin, upsample):
        super().__init__()
        self.to_style = tnn.Linear(latent, cin)
        self.conv = TConv2DMod(cin, 3, 1, demod=False)
        self.do_upsample = upsample

    def forward(self, x, prev, w):
        x = self.conv(x, self.to_style(w))
        if prev is not None:
            x = x + prev
        if self.do_upsample:
            x = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
            x = t_blur(x)
        return x


class TGenBlock(tnn.Module):
    def __init__(self, latent, cin, cout, upsample, upsample_rgb):
        super().__init__()
        self.do_upsample = upsample
        self.to_style1 = tnn.Linear(latent, cin)
        self.to_noise1 = tnn.Linear(1, cout)
        self.conv1 = TConv2DMod(cin, cout, 3)
        self.to_style2 = tnn.Linear(latent, cout)
        self.to_noise2 = tnn.Linear(1, cout)
        self.conv2 = TConv2DMod(cout, cout, 3)
        self.to_rgb = TRGB(latent, cout, upsample_rgb)

    def forward(self, x, prev, w, inoise):
        if self.do_upsample:
            x = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        inoise = inoise[:, : x.shape[2], : x.shape[3], :]
        n1 = self.to_noise1(inoise).permute(0, 3, 2, 1)
        n2 = self.to_noise2(inoise).permute(0, 3, 2, 1)
        s1 = self.to_style1(w)
        x = tF.leaky_relu(self.conv1(x, s1) + n1, 0.2)
        s2 = self.to_style2(w)
        coords = torch.cat([s1, s2], dim=-1)
        x = tF.leaky_relu(self.conv2(x, s2) + n2, 0.2)
        return x, self.to_rgb(x, prev, w), coords


class TGenerator(tnn.Module):
    def __init__(self, image_size, latent, cap):
        super().__init__()
        n = int(math.log2(image_size) - 1)
        fs = [min(cap * 2 ** (i + 1), 512) for i in range(n)][::-1]
        fs = [fs[0], *fs]
        self.initial_block = tnn.Parameter(torch.randn(1, fs[0], 4, 4))
        self.initial_conv = tnn.Conv2d(fs[0], fs[0], 3, padding=1)
        self.blocks = tnn.ModuleList(
            [
                TGenBlock(latent, cin, cout, upsample=i != 0, upsample_rgb=i != n - 1)
                for i, (cin, cout) in enumerate(zip(fs[:-1], fs[1:]))
            ]
        )

    def forward(self, ws, inoise):
        x = self.initial_conv(self.initial_block.expand(ws.shape[0], -1, -1, -1))
        rgb = None
        all_coords = []
        for i, block in enumerate(self.blocks):
            x, rgb, coords = block(x, rgb, ws[:, i], inoise)
            all_coords.append(coords)
        return rgb, torch.cat(all_coords, dim=-1)


class TDiscBlock(tnn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.conv_res = tnn.Conv2d(cin, cout, 1, stride=2 if downsample else 1)
        self.net = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1), tnn.LeakyReLU(0.2),
            tnn.Conv2d(cout, cout, 3, padding=1), tnn.LeakyReLU(0.2),
        )
        self.downsample = (
            tnn.Sequential(DummyBlur(), tnn.Conv2d(cout, cout, 3, padding=1, stride=2))
            if downsample else None
        )

    def forward(self, x):
        res = self.conv_res(x)
        x = self.net(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return (x + res) / math.sqrt(2)


class DummyBlur(tnn.Module):
    def forward(self, x):
        return t_blur(x)


class TDiscriminatorE(tnn.Module):
    def __init__(self, image_size, cap, out_dim):
        super().__init__()
        n = int(math.log2(image_size) - 1)
        fs = [3] + [min(cap * 4 * 2**i, 512) for i in range(n + 1)]
        pairs = list(zip(fs[:-1], fs[1:]))
        self.blocks = tnn.ModuleList(
            [TDiscBlock(a, b, downsample=i != len(pairs) - 1) for i, (a, b) in enumerate(pairs)]
        )
        self.final_conv = tnn.Conv2d(fs[-1], fs[-1], 3, padding=1)
        self.fc = tnn.Linear(2 * 2 * fs[-1], out_dim)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        x = self.final_conv(x)
        return self.fc(x.reshape(x.shape[0], -1))


class TStylEx(tnn.Module):
    def __init__(self):
        super().__init__()
        self.S = TMapping(LATENT)
        self.G = TGenerator(IMAGE_SIZE, LATENT, CAP)
        self.D = TDiscriminatorE(IMAGE_SIZE, CAP, 1)
        self.encoder = TDiscriminatorE(IMAGE_SIZE, CAP, 32)
        self.SE = TMapping(LATENT)
        self.GE = TGenerator(IMAGE_SIZE, LATENT, CAP)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    oracle = TStylEx().eval()
    cfg = ModelConfig(image_size=IMAGE_SIZE, network_capacity=CAP, latent_dim=LATENT,
                      encoder_dim=32, style_depth=3)
    modules = build_stylex(cfg)
    params = convert_stylex_state_dict(oracle.state_dict(), cfg)
    return oracle, cfg, modules, params


@pytest.mark.slow
def test_mapping_parity(pair):
    oracle, cfg, modules, params = pair
    z = torch.randn(3, LATENT)
    with torch.no_grad():
        want = oracle.S(z).numpy()
    got = np.asarray(modules.map_z(params, jnp.asarray(z.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    got_e = np.asarray(modules.map_z(params, jnp.asarray(z.numpy()), ema=True))
    with torch.no_grad():
        want_e = oracle.SE(z).numpy()
    np.testing.assert_allclose(got_e, want_e, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_generator_parity(pair):
    oracle, cfg, modules, params = pair
    torch.manual_seed(1)
    w = torch.randn(2, len(oracle.G.blocks), LATENT)
    inoise = torch.rand(2, IMAGE_SIZE, IMAGE_SIZE, 1)
    with torch.no_grad():
        want_rgb, want_coords = oracle.G(w, inoise)
    got_rgb, got_coords = modules.generate(
        params, jnp.asarray(w.numpy()), jnp.asarray(inoise.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(got_rgb), want_rgb.permute(0, 2, 3, 1).numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(got_coords), want_coords.numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_discriminator_and_encoder_parity(pair):
    oracle, cfg, modules, params = pair
    torch.manual_seed(2)
    x = torch.rand(2, 3, IMAGE_SIZE, IMAGE_SIZE)
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    with torch.no_grad():
        want_d = oracle.D(x).numpy()[:, 0]
        want_e = oracle.encoder(x).numpy()
    got_d = np.asarray(modules.discriminate(params, xj))
    got_e = np.asarray(modules.encode(params, xj))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(got_e, want_e, rtol=1e-3, atol=1e-4)
