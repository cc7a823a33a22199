"""Golden parity against the reference's LITERAL source code.

Unlike ``test_convert_parity.py`` (torch oracle re-typed from the paper
architecture), these tests exec the classes straight out of
``/root/reference/stylex/stylex_train.py`` (see ``reference_src.py``) and
assert that converting the resulting state dict with
``convert_stylex_state_dict`` reproduces the reference modules' outputs —
mapping, generator (+ style coords), discriminator, encoder — and that our
explicit ``style_delta`` equals the reference's bias-mutation AttFind trick
(the "# Perturb here" sites, `stylex_train.py:702-713`) on the reference's
own generator.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from stylex_tpu.config import ModelConfig
from stylex_tpu.models import build_stylex
from stylex_tpu.models.convert import convert_stylex_state_dict
from stylex_tpu.ops.latents import expand_styles

from reference_src import ReferenceStylExContainer, load_reference_namespace

IMAGE_SIZE = 16
CAP = 4
LATENT = 34
ATOL = 2e-4


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = ReferenceStylExContainer(IMAGE_SIZE, LATENT, CAP, encoder_dim=32)
    ref.eval()
    cfg = ModelConfig(image_size=IMAGE_SIZE, network_capacity=CAP,
                      latent_dim=LATENT, encoder_dim=32)
    modules = build_stylex(cfg)
    params = convert_stylex_state_dict(ref.state_dict(), cfg)
    return ref, cfg, modules, params


def _t2j_img(x: torch.Tensor) -> jnp.ndarray:
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def test_mapping_parity_reference_source(pair):
    ref, cfg, modules, params = pair
    z = torch.randn(6, LATENT)
    with torch.no_grad():
        want = ref.S(z).numpy()
    got = np.asarray(modules.map_z(params, jnp.asarray(z.numpy())))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_generator_parity_reference_source(pair):
    ref, cfg, modules, params = pair
    B, L = 3, modules.num_layers
    z = torch.randn(B, LATENT)
    noise = torch.rand(B, IMAGE_SIZE, IMAGE_SIZE, 1)
    with torch.no_grad():
        w = ref.S(z)
        ws = w[:, None, :].expand(B, L, LATENT)
        img_ref, coords_ref = ref.G(ws, noise, get_style_coords=True)

    w_j = jnp.asarray(w.numpy())
    img, coords = modules.generate(
        params, expand_styles(w_j, L), jnp.asarray(noise.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(img), img_ref.numpy().transpose(0, 2, 3, 1), atol=ATOL
    )
    np.testing.assert_allclose(np.asarray(coords), coords_ref.numpy(), atol=ATOL)
    assert coords.shape[-1] == modules.total_style_coords


def test_discriminator_and_encoder_parity_reference_source(pair):
    ref, cfg, modules, params = pair
    x = torch.rand(4, 3, IMAGE_SIZE, IMAGE_SIZE)
    with torch.no_grad():
        d_want = ref.D(x).numpy()
        e_want = ref.encoder(x).numpy()
    d_got = np.asarray(modules.discriminate(params, _t2j_img(x)))
    e_got = np.asarray(modules.encode(params, _t2j_img(x)))
    np.testing.assert_allclose(d_got, d_want, atol=ATOL)
    np.testing.assert_allclose(e_got, e_want, atol=ATOL)


def test_style_delta_equals_reference_bias_mutation(pair):
    """AttFind's bias-mutation (notebook semantics: shift the style vector at
    one StyleSpace coordinate before the modulated conv) on the REFERENCE
    generator == our pure ``style_delta`` on the converted params."""
    ref, cfg, modules, params = pair
    B, L = 2, modules.num_layers
    torch.manual_seed(3)
    z = torch.randn(B, LATENT)
    noise = torch.rand(B, IMAGE_SIZE, IMAGE_SIZE, 1)
    with torch.no_grad():
        w = ref.S(z)
    ws = w[:, None, :].expand(B, L, LATENT)

    # pick one coordinate in each block half: style1 of block 1, style2 of block 2
    # global layout: per block [style1 (in_chan), style2 (filters)], blocks concatenated
    shift = 2.5
    sizes = [(blk.input_channels, blk.filters) for blk in ref.G.blocks]
    offsets = np.cumsum([0] + [a + b for a, b in sizes])

    # coordinate A: block 1, style1 channel 2 -> global index
    gA = offsets[1] + 2
    # coordinate B: block 2, style2 channel 1 -> global index
    gB = offsets[2] + sizes[2][0] + 1

    # reference-side mutation: bias shift on to_style{1,2} reproduces the
    # notebook's style perturbation exactly (style = W·w + b, so b += shift
    # shifts the style coordinate for every batch item)
    import copy

    refG = copy.deepcopy(ref.G)
    with torch.no_grad():
        refG.blocks[1].to_style1.bias[2] += shift
        refG.blocks[2].to_style2.bias[1] += shift
        want = refG(ws, noise).numpy().transpose(0, 2, 3, 1)

    delta = jnp.zeros((B, modules.total_style_coords)).at[:, gA].set(shift).at[:, gB].set(shift)
    got, _ = modules.generate(
        params, expand_styles(jnp.asarray(w.numpy()), L),
        jnp.asarray(noise.numpy()), style_delta=delta,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)


def test_losses_match_reference_source():
    ns = load_reference_namespace()
    from stylex_tpu.losses import (
        classifier_kl_loss,
        d_hinge_loss,
        dual_contrastive_loss,
        g_hinge_loss,
    )

    rng = np.random.RandomState(0)
    real = rng.randn(8).astype(np.float32)
    fake = rng.randn(8).astype(np.float32)
    tr, tf_ = torch.tensor(real), torch.tensor(fake)
    assert np.isclose(
        float(d_hinge_loss(jnp.asarray(real), jnp.asarray(fake))),
        ns["hinge_loss"](tr, tf_).item(), atol=1e-5,
    )
    assert np.isclose(
        float(g_hinge_loss(jnp.asarray(fake))),
        ns["gen_hinge_loss"](tf_, tr).item(), atol=1e-5,
    )
    assert np.isclose(
        float(dual_contrastive_loss(jnp.asarray(real), jnp.asarray(fake))),
        ns["dual_contrastive_loss"](tr, tf_).item(), atol=1e-5,
    )
    rl = rng.randn(4, 2).astype(np.float32)
    fl = rng.randn(4, 2).astype(np.float32)
    assert np.isclose(
        float(classifier_kl_loss(jnp.asarray(rl), jnp.asarray(fl))),
        ns["classifier_kl_loss"](torch.tensor(rl), torch.tensor(fl)).item(),
        atol=1e-5,
    )


def test_blur_and_attention_match_reference_source():
    ns = load_reference_namespace()
    from stylex_tpu.models.layers import LinearAttention as JLinearAttention
    from stylex_tpu.ops.blur import blur3

    x = torch.rand(2, 8, 8, 8)
    with torch.no_grad():
        want = ns["Blur"]()(x).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(blur3(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5)

    torch.manual_seed(1)
    tattn = ns["LinearAttention"](dim=8, dim_head=4, heads=2)
    tattn.eval()
    jattn = JLinearAttention(dim=8, dim_head=4, heads=2)
    from stylex_tpu.models.convert import _conv

    sd = tattn.state_dict()
    jparams = {
        "to_q": _conv(sd, "to_q"),
        "to_kv_depth": _conv(sd, "to_kv.net.0"),
        "to_kv_point": _conv(sd, "to_kv.net.1"),
        "to_out": _conv(sd, "to_out"),
    }
    xin = torch.rand(2, 8, 6, 6)
    with torch.no_grad():
        want = tattn(xin).numpy().transpose(0, 2, 3, 1)
    got = jattn.apply({"params": jparams}, jnp.asarray(xin.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
