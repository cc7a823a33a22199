"""StylEx generator — StyleGAN2 synthesis with an explicit StyleSpace port.

TPU-first redesign of the reference generator
(`/root/reference/stylex/stylex_train.py:604-839`):

* ``Conv2DMod`` becomes :func:`stylex_tpu.ops.modulated_conv2d` (input
  scaling + XLA conv + demod epilogue — pure MXU work, NHWC).
* The StyleSpace is a first-class *input*: ``style_delta`` is added to the
  per-block style activations, replacing the reference AttFind trick of
  temporarily mutating ``to_style1/to_style2.bias`` in-place
  (`run_attfind_combined.ipynb` cell 5). This makes perturbation sweeps pure
  functions that can be vmapped/sharded over thousands of coordinates.
* Style coordinates (the concatenation of each block's ``style1`` and
  ``style2``, `stylex_train.py:705-707`) are always returned; XLA dead-code
  eliminates them when unused.

Faithfully kept quirks (needed for checkpoint/output parity):

* the per-pixel noise map is spatially *transposed* before being added
  (torch ``.permute(0, 3, 2, 1)`` on NHWC data, `stylex_train.py:692-694`),
* each block slices the top-left corner of one shared full-resolution noise
  image (`stylex_train.py:691`),
* ``to_noise1/2`` are zero-initialised (`stylex_train.py:979-983`).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from stylex_tpu.models.layers import (
    ConvTorch,
    DenseTorch,
    AttnAndFF,
    kaiming_normal_leaky,
    leaky_relu,
)
from stylex_tpu.ops.blur import upsample2x_bilinear, upsample2x_blur
from stylex_tpu.ops.modconv import modulated_conv2d, modulated_upsample_conv2d
from stylex_tpu.ops.fusion import resample_fusion_enabled

__all__ = [
    "Generator",
    "GeneratorBlock",
    "RGBBlock",
    "generator_filters",
    "style_coord_dims",
    "num_style_coords",
    "sindex_to_block_and_offset",
]


def generator_filters(image_size: int, network_capacity: int = 16, fmap_max: int = 512) -> List[int]:
    """Per-block channel plan (`Generator.__init__`, `stylex_train.py:753-760`).

    Returns ``[init_channels, f1, ..., fn]`` with ``n = log2(size) - 1``.
    """
    num_layers = int(math.log2(image_size) - 1)
    filters = [network_capacity * (2 ** (i + 1)) for i in range(num_layers)][::-1]
    filters = [min(f, fmap_max) for f in filters]
    return [filters[0], *filters]


def style_coord_dims(image_size: int, network_capacity: int = 16, fmap_max: int = 512) -> List[Tuple[int, int]]:
    """Per-block (input_channels, filters) pairs; the block's StyleSpace slice
    has size ``input_channels + filters`` (`stylex_train.py:677`)."""
    f = generator_filters(image_size, network_capacity, fmap_max)
    return list(zip(f[:-1], f[1:]))


def num_style_coords(image_size: int, network_capacity: int = 16, fmap_max: int = 512) -> int:
    """Total StyleSpace dimensionality (2464 for the 64px default config)."""
    return sum(i + o for i, o in style_coord_dims(image_size, network_capacity, fmap_max))


def sindex_to_block_and_offset(
    sindex: int, image_size: int, network_capacity: int = 16, fmap_max: int = 512
) -> Tuple[int, int]:
    """Map a flat StyleSpace index to (block index, within-block offset).

    Mirror of ``sindex_to_block_idx_and_index``
    (`run_attfind_combined.ipynb` cell 5). Offsets < input_channels land in
    ``style1``; the remainder in ``style2``.
    """
    remaining = sindex
    for block_idx, (i, o) in enumerate(style_coord_dims(image_size, network_capacity, fmap_max)):
        if remaining < i + o:
            return block_idx, remaining
        remaining -= i + o
    raise IndexError(f"style index {sindex} out of range")


class RGBBlock(nn.Module):
    """Per-block to-RGB skip path (`RGBBlock`, `stylex_train.py:604-629`)."""

    latent_dim: int
    input_channel: int
    upsample: bool
    rgba: bool = False

    @nn.compact
    def __call__(self, x, prev_rgb, istyle):
        out_filters = 4 if self.rgba else 3
        style = DenseTorch(self.input_channel, name="to_style")(istyle)
        weight = self.param(
            "conv_weight", kaiming_normal_leaky(), (1, 1, self.input_channel, out_filters)
        )
        x = modulated_conv2d(x, weight, style, demod=False)
        if prev_rgb is not None:
            x = x + prev_rgb
        if self.upsample:
            x = upsample2x_blur(x)
        return x


class GeneratorBlock(nn.Module):
    """One synthesis block (`GeneratorBlock`, `stylex_train.py:670-718`).

    ``delta1``/``delta2`` are optional additive perturbations to the style
    activations — the functional equivalent of the reference's AttFind bias
    mutation ("Perturb here" markers, `stylex_train.py:702,711`).
    """

    latent_dim: int
    input_channels: int
    filters: int
    upsample: bool = True
    upsample_rgb: bool = True
    rgba: bool = False

    @property
    def num_style_coords(self) -> int:
        return self.input_channels + self.filters

    @nn.compact
    def __call__(self, x, prev_rgb, istyle, inoise, delta1=None, delta2=None):
        # The upsample is folded into conv1 (one polyphase coarse-grid conv,
        # ops/upconv.py) unless opted out: the unfused path materializes the
        # 4x activation in HBM and is the sweep's most expensive stage
        # (docs/ROOFLINE.md). Both paths are equal to reassociation rounding.
        fuse_up = self.upsample and resample_fusion_enabled()
        if self.upsample and not fuse_up:
            x = upsample2x_bilinear(x)

        b, h, w, _ = x.shape
        if fuse_up:
            h, w = 2 * h, 2 * w
        inoise = inoise[:, :h, :w, :]
        zeros = nn.initializers.zeros_init()
        noise1 = DenseTorch(self.filters, kernel_init=zeros, bias_init=zeros, name="to_noise1")(inoise)
        noise2 = DenseTorch(self.filters, kernel_init=zeros, bias_init=zeros, name="to_noise2")(inoise)
        # Reference permute(0,3,2,1) on NCHW == spatial transpose in NHWC.
        noise1 = jnp.transpose(noise1, (0, 2, 1, 3))
        noise2 = jnp.transpose(noise2, (0, 2, 1, 3))

        style1 = DenseTorch(self.input_channels, name="to_style1")(istyle)
        if delta1 is not None:
            style1 = style1 + delta1

        w1 = self.param(
            "conv1_weight", kaiming_normal_leaky(), (3, 3, self.input_channels, self.filters)
        )
        if fuse_up:
            x = modulated_upsample_conv2d(x, w1, style1)
        else:
            x = modulated_conv2d(x, w1, style1)
        x = leaky_relu(x + noise1)

        style2 = DenseTorch(self.filters, name="to_style2")(istyle)
        if delta2 is not None:
            style2 = style2 + delta2

        style_coords = jnp.concatenate([style1, style2], axis=-1)

        w2 = self.param("conv2_weight", kaiming_normal_leaky(), (3, 3, self.filters, self.filters))
        x = modulated_conv2d(x, w2, style2)
        x = leaky_relu(x + noise2)

        rgb = RGBBlock(
            self.latent_dim, self.filters, self.upsample_rgb, self.rgba, name="to_rgb"
        )(x, prev_rgb, istyle)
        return x, rgb, style_coords


class Generator(nn.Module):
    """Full synthesis network (`Generator`, `stylex_train.py:747-839`)."""

    image_size: int
    latent_dim: int
    network_capacity: int = 16
    transparent: bool = False
    attn_layers: Sequence[int] = ()
    no_const: bool = False
    fmap_max: int = 512
    # remat each block's backward pass (high-res memory/FLOP trade)
    remat: bool = False

    @property
    def num_layers(self) -> int:
        return int(math.log2(self.image_size) - 1)

    @property
    def block_dims(self) -> List[Tuple[int, int]]:
        return style_coord_dims(self.image_size, self.network_capacity, self.fmap_max)

    @property
    def total_style_coords(self) -> int:
        return sum(i + o for i, o in self.block_dims)

    @nn.compact
    def __call__(
        self,
        styles,
        input_noise,
        style_delta: Optional[jax.Array] = None,
        start_block: int = 0,
        initial_state: Optional[Tuple[jax.Array, Optional[jax.Array]]] = None,
        capture_states: bool = False,
    ):
        """Synthesise images, optionally resuming from a cached block state.

        A StyleSpace perturbation at block ``k`` cannot change anything
        upstream of block ``k``, so AttFind sweeps can cache each image's
        per-block entry state once and re-run only blocks ``k..end`` per
        perturbation (the reference recomputes the full generator for every
        one of its ~1.23M bias mutations, `run_attfind_combined.ipynb`
        cell 5). ``capture_states=True`` returns the list of per-block
        ``(x, rgb)`` entry pairs; ``start_block=k`` with
        ``initial_state=(x_k, rgb_k)`` resumes there. Parameter names and
        the default path are unchanged.

        Args:
          styles: (B, num_layers, latent_dim) per-layer w vectors.
          input_noise: (B, image_size, image_size, 1) uniform noise image.
          style_delta: optional (B, total_style_coords) additive StyleSpace
            perturbation (full-width even when resuming; upstream slices
            are ignored).
          start_block: static index of the first synthesis block to run.
          initial_state: the (x, rgb) entry state of ``start_block``
            (required when ``start_block > 0``; at ``start_block == 0`` it
            replaces the constant-input + initial_conv stem, letting
            sweeps skip even that recompute).
          capture_states: also return every block's entry state.

        Returns:
          (rgb, style_coords[, states]): the (B, S, S, 3[4]) image, the
          (B, total_style_coords) style coordinates (blocks before
          ``start_block`` zero-filled), and, when capturing, the list of
          per-block (x, rgb) entry pairs.
        """
        block_dims = self.block_dims
        init_channels = block_dims[0][0]
        batch = styles.shape[0]

        if initial_state is not None:
            x, rgb = initial_state
        elif start_block == 0:
            if self.no_const:
                avg_style = jnp.mean(styles, axis=1)[:, None, None, :]
                x = nn.ConvTranspose(
                    init_channels,
                    (4, 4),
                    strides=(1, 1),
                    padding="VALID",
                    use_bias=False,
                    kernel_init=kaiming_normal_leaky(),
                    name="to_initial_block",
                )(avg_style)
                x = ConvTorch(init_channels, 3, padding=1, name="initial_conv")(x)
            else:
                initial = self.param(
                    "initial_block", nn.initializers.normal(stddev=1.0), (1, 4, 4, init_channels)
                )
                # The stem conv commutes with the batch broadcast of the
                # learned constant (identical inputs, shared weights) — conv
                # once at batch 1, broadcast the OUTPUT. The reference convs
                # the expanded batch (`stylex_train.py:807-812,821-823`);
                # same math, batch× fewer stem FLOPs where XLA can't fold
                # params into constants (train step). Param tree unchanged.
                seed = ConvTorch(init_channels, 3, padding=1, name="initial_conv")(
                    initial.astype(styles.dtype)
                )
                x = jnp.broadcast_to(seed, (batch, 4, 4, init_channels))
            rgb = None
        else:
            raise ValueError("start_block > 0 requires initial_state=(x, rgb)")

        coords = []
        states = []
        offset = 0
        for ind, (in_chan, out_chan) in enumerate(block_dims):
            if ind < start_block:
                coords.append(jnp.zeros((batch, in_chan + out_chan), styles.dtype))
                offset += in_chan + out_chan
                continue
            if capture_states:
                states.append((x, rgb))
            num_layer = self.num_layers - ind
            istyle = styles[:, ind]
            if num_layer in self.attn_layers:
                x = AttnAndFF(in_chan, name=f"attn{ind}")(x)

            d1 = d2 = None
            if style_delta is not None:
                d1 = style_delta[:, offset : offset + in_chan]
                d2 = style_delta[:, offset + in_chan : offset + in_chan + out_chan]
            offset += in_chan + out_chan

            block_cls = nn.remat(GeneratorBlock) if self.remat else GeneratorBlock
            x, rgb, block_coords = block_cls(
                self.latent_dim,
                in_chan,
                out_chan,
                upsample=ind != 0,
                upsample_rgb=ind != (self.num_layers - 1),
                rgba=self.transparent,
                name=f"block{ind}",
            )(x, rgb, istyle, input_noise, d1, d2)
            coords.append(block_coords)

        out = (rgb, jnp.concatenate(coords, axis=-1))
        if capture_states:
            out += (states,)
        return out
