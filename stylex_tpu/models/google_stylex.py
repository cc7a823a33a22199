"""Google-architecture StylEx generator (the published pretrained models).

The counterfactual-FID protocol (`/root/reference/stylex/FID_TensorFlow.ipynb`)
runs against *Google's* pretrained CelebA-age StylEx — the original TF
implementation, NOT the lucidrains-derived reproduction this repo mirrors
elsewhere. Its generator splits into

* ``style_vector_calculator`` — per-conv-layer affines ``s_i = w @ K_i + b_i``
  from the 514-dim dlatent (512 + 2 condition dims), exposed as
  ``style_dense_blocks[i]`` whose ``dense_bias`` the notebook mutates for
  counterfactuals (cells 16, 20), plus separate to-RGB affines;
* ``g_synthesis`` — a StyleGAN2-skip synthesis network consuming the style
  lists and producing an NCHW image in [-1, 1] (cell 15 ``call_synthesis``
  clips); dlatents are tiled over ``num_layers`` slots but only slot 0
  feeds the calculator (cell 15: ``dlatents_expanded[:, 0]``).

This module is the TPU-native equivalent: one jitted forward with the
style-space shift as an explicit ``style_delta`` input (replacing the
notebook's ``dense_bias.weights[0].assign_add`` mutation dance), built on
the same :func:`~stylex_tpu.ops.modconv.modulated_conv2d` MXU formulation
as the main generator. Weights come from
:func:`stylex_tpu.ingest_tf.convert_google_generator`, which reads the
``generator.savedmodel`` directory layout.

Architectural parameters (channel schedule, conv counts) follow StyleGAN2
config at 256px: resolutions 4..S, one 3x3 conv at 4px then two per higher
resolution, a to-RGB skip per resolution — 13 conv layers / 7 to-RGBs at
256px, matching the 14-slot dlatent tiling (`FID_TensorFlow.ipynb` cell 3
``num_layers = 14``). If the real artifact's variable layout deviates, the
converter reports exactly what it found (``describe_savedmodel``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stylex_tpu.ops.blur import upsample2x_bilinear
from stylex_tpu.ops.modconv import modulated_conv2d, modulated_upsample_conv2d
from stylex_tpu.ops.fusion import resample_fusion_enabled

__all__ = ["GoogleStylExGenerator", "google_channels", "sindex_to_layer_and_index"]


def sindex_to_layer_and_index(
    layer_shapes: Sequence[int], sindex: int
) -> Tuple[int, int]:
    """Flat StyleSpace index -> (layer, within-layer index) given per-layer
    style widths (the notebook's ``sindex_to_layer_idx_and_index`` over
    ``LAYER_SHAPES``, cell 16). Shared by the JAX generator and the TF
    SavedModel driver so both paths index StyleSpace identically."""
    cum = np.concatenate([[0], np.cumsum(layer_shapes)])
    if not 0 <= sindex < cum[-1]:
        raise IndexError(
            f"sindex {sindex} outside StyleSpace [0, {int(cum[-1])})"
        )
    layer = int(np.flatnonzero(cum <= sindex)[-1])
    return layer, int(sindex - cum[layer])


def google_channels(
    image_size: int, fmap_base: int = 8192, fmap_max: int = 512, fmap_min: int = 1
) -> Dict[int, int]:
    """StyleGAN2 ``nf()`` channel schedule per resolution."""
    out = {}
    for r in range(2, int(math.log2(image_size)) + 1):
        out[2 ** r] = int(min(max(fmap_base // (2 ** (r - 1)), fmap_min), fmap_max))
    return out


@dataclasses.dataclass(frozen=True)
class GoogleStylExGenerator:
    image_size: int = 256
    dlatent_dim: int = 514
    fmap_base: int = 8192
    fmap_max: int = 512
    # explicit (resolution, channels) override — the converter sets this
    # from the artifact's actual conv shapes instead of guessing fmap_base
    channels_map: Optional[Tuple[Tuple[int, int], ...]] = None

    # ------------------------------------------------------------ structure
    @property
    def channels(self) -> Dict[int, int]:
        if self.channels_map is not None:
            return dict(self.channels_map)
        return google_channels(self.image_size, self.fmap_base, self.fmap_max)

    @property
    def resolutions(self) -> List[int]:
        return sorted(self.channels)

    @property
    def num_layers(self) -> int:
        """dlatent tiling slots: 2 * log2(S) - 2 (14 at 256px, cell 3)."""
        return 2 * int(math.log2(self.image_size)) - 2

    @property
    def conv_specs(self) -> List[Tuple[int, int, int]]:
        """(resolution, in_ch, out_ch) per 3x3 conv, synthesis order:
        one conv at 4px, then (up-conv, conv) per higher resolution."""
        ch = self.channels
        specs = [(4, ch[4], ch[4])]
        prev = ch[4]
        for res in self.resolutions[1:]:
            specs.append((res, prev, ch[res]))
            specs.append((res, ch[res], ch[res]))
            prev = ch[res]
        return specs

    @property
    def torgb_specs(self) -> List[Tuple[int, int]]:
        """(resolution, in_ch) per to-RGB layer."""
        return [(res, self.channels[res]) for res in self.resolutions]

    @property
    def layer_shapes(self) -> List[int]:
        """Per style_dense_block style width (= conv in_ch), the notebook's
        ``LAYER_SHAPES`` (cell 16)."""
        return [in_ch for (_, in_ch, _) in self.conv_specs]

    @property
    def total_style_coords(self) -> int:
        return sum(self.layer_shapes)

    def sindex_to_layer_and_index(self, sindex: int) -> Tuple[int, int]:
        """Flat StyleSpace index -> (conv layer, within-layer index)
        (``sindex_to_layer_idx_and_index``, cell 16)."""
        return sindex_to_layer_and_index(self.layer_shapes, sindex)

    # ---------------------------------------------------------------- init
    def init_params(self, key: jax.Array) -> Dict:
        d = self.dlatent_dim

        def k(*path):
            out = key
            for p in path:
                out = jax.random.fold_in(out, p)
            return out

        params: Dict = {
            "const": jax.random.normal(k(0), (1, 4, 4, self.channels[4])) * 0.1,
            "convs": [],
            "torgbs": [],
        }
        for i, (_, cin, cout) in enumerate(self.conv_specs):
            params["convs"].append({
                "weight": jax.random.normal(k(1, i), (3, 3, cin, cout))
                * (1.0 / math.sqrt(9 * cin)),
                "bias": jnp.zeros((cout,)),
                "style_kernel": jax.random.normal(k(2, i), (d, cin)) / math.sqrt(d),
                "style_bias": jnp.ones((1, cin)),
            })
        for i, (_, cin) in enumerate(self.torgb_specs):
            params["torgbs"].append({
                "weight": jax.random.normal(k(3, i), (1, 1, cin, 3))
                * (1.0 / math.sqrt(cin)),
                "bias": jnp.zeros((3,)),
                "style_kernel": jax.random.normal(k(4, i), (d, cin)) / math.sqrt(d),
                "style_bias": jnp.ones((1, cin)),
            })
        return params

    # ------------------------------------------------------------- forward
    def style_vectors(self, params, w: jax.Array):
        """``style_vector_calculator``: per-conv and per-to-RGB style lists
        from the (B, 514) dlatent (slot 0 of the tiled input, cell 15)."""
        conv_styles = [
            w @ p["style_kernel"].astype(w.dtype) + p["style_bias"].astype(w.dtype)
            for p in params["convs"]
        ]
        torgb_styles = [
            w @ p["style_kernel"].astype(w.dtype) + p["style_bias"].astype(w.dtype)
            for p in params["torgbs"]
        ]
        return conv_styles, torgb_styles

    def synthesize(
        self,
        params,
        w: jax.Array,
        style_delta: Optional[jax.Array] = None,
    ) -> jax.Array:
        """dlatent (B, 514) -> NHWC image (raw; the protocol clips to [-1,1]).

        ``style_delta`` (B, total_style_coords) adds to the concatenated
        conv style vectors — the functional equivalent of the notebook's
        ``dense_bias.weights[0].assign_add(one_hot * shift)`` (cell 20).
        """
        conv_styles, torgb_styles = self.style_vectors(params, w)
        if style_delta is not None:
            off = 0
            shifted = []
            for s in conv_styles:
                width = s.shape[-1]
                shifted.append(s + style_delta[:, off : off + width].astype(s.dtype))
                off += width
            conv_styles = shifted

        b = w.shape[0]
        x = jnp.broadcast_to(
            params["const"].astype(w.dtype), (b,) + params["const"].shape[1:]
        )
        rgb = None
        conv_i = 0
        import os

        for res_i, res in enumerate(self.resolutions):
            n_convs = 1 if res == 4 else 2
            for k in range(n_convs):
                p = params["convs"][conv_i]
                # the affine output modulates directly (StyleGAN2 semantics);
                # modulated_conv2d applies style+1, so subtract the offset
                if res != 4 and k == 0:
                    if (
                        p["weight"].shape[:2] == (3, 3)
                        and x.shape[1] >= 2
                        and resample_fusion_enabled()
                    ):
                        # upsample folded into the conv — one polyphase
                        # coarse-grid pass (ops/modconv.py), same math
                        x = modulated_upsample_conv2d(
                            x, p["weight"], conv_styles[conv_i] - 1.0, demod=True
                        )
                    else:
                        x = upsample2x_bilinear(x)
                        x = modulated_conv2d(
                            x, p["weight"], conv_styles[conv_i] - 1.0, demod=True
                        )
                else:
                    x = modulated_conv2d(
                        x, p["weight"], conv_styles[conv_i] - 1.0, demod=True
                    )
                x = jax.nn.leaky_relu(x + p["bias"].astype(x.dtype), 0.2)
                conv_i += 1
            tp = params["torgbs"][res_i]
            y = modulated_conv2d(x, tp["weight"], torgb_styles[res_i] - 1.0, demod=False)
            y = y + tp["bias"].astype(y.dtype)
            rgb = y if rgb is None else upsample2x_bilinear(rgb) + y
        return rgb

    def call_synthesis(self, params, dlatents_tiled: jax.Array, style_delta=None):
        """The notebook's ``call_synthesis`` (cell 15): accepts the tiled
        (B, num_layers, 514) dlatents, uses slot 0, clips to [-1, 1]."""
        w = dlatents_tiled[:, 0] if dlatents_tiled.ndim == 3 else dlatents_tiled
        img = self.synthesize(params, w, style_delta=style_delta)
        return jnp.clip(img, -1.0, 1.0)
