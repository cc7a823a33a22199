"""Reference checkpoint converter: torch StylEx ``.pt`` -> stylex_tpu params.

The reference checkpoints hold ``{'StylEx': state_dict, 'version'}``
(`/root/reference/stylex/stylex_train.py:1736-1746`) with module paths like
``G.blocks.0.to_style1.weight`` or ``D.blocks.2.net.0.weight``. This module
maps them onto our flax trees so released reference models can be loaded for
golden-output parity tests and AttFind coordinate comparison (SURVEY §5.4).

Layout conversions:

* torch Linear ``(out, in)``      -> flax kernel ``(in, out)``,
* torch Conv OIHW                 -> flax HWIO,
* ``Conv2DMod`` weight (o,i,k,k)  -> our ``conv{1,2}_weight`` (k,k,i,o),
* ``initial_block`` (1,C,4,4)     -> (1,4,4,C),
* D/E ``fc`` over the flattened 2x2 map: torch flattens (C,2,2)
  channel-major, we flatten (2,2,C) — input columns are permuted.
* ``Blur`` tap buffers (`…upsample.1.f`, `…downsample.0.f`) carry no
  learnable state and are dropped.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from stylex_tpu.config import ModelConfig
from stylex_tpu.models.discriminator import discriminator_filters
from stylex_tpu.models.generator import generator_filters

__all__ = ["convert_stylex_state_dict", "load_reference_checkpoint"]


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(sd, prefix):
    out = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _conv(sd, prefix):
    out = {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(_np(sd[f"{prefix}.bias"]))
    return out


def _modconv_weight(sd, key):
    return jnp.asarray(_np(sd[key]).transpose(2, 3, 1, 0))


def _fc_flatten_permuted(sd, prefix, chan_last: int):
    """Permute fc input columns from torch's (C, 2, 2) flatten order to our
    (2, 2, C) order."""
    w = _np(sd[f"{prefix}.weight"])  # (out, C*4)
    out_dim = w.shape[0]
    w4 = w.reshape(out_dim, chan_last, 2, 2)
    w_ours = w4.transpose(0, 2, 3, 1).reshape(out_dim, 4 * chan_last)
    return {"kernel": jnp.asarray(w_ours.T), "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _convert_mapping(sd, prefix: str, depth: int) -> Dict[str, Any]:
    return {f"fc{i}": _linear(sd, f"{prefix}.net.{2 * i}") for i in range(depth)}


def _convert_generator(sd, prefix: str, cfg: ModelConfig) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    if f"{prefix}.initial_block" in sd:
        params["initial_block"] = jnp.asarray(
            _np(sd[f"{prefix}.initial_block"]).transpose(0, 2, 3, 1)
        )
    else:  # no_const: ConvTranspose2d(latent, C, 4) -> flax ConvTranspose HWIO
        w = _np(sd[f"{prefix}.to_initial_block.weight"])  # (in, out, kh, kw)
        params["to_initial_block"] = {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}
    params["initial_conv"] = _conv(sd, f"{prefix}.initial_conv")
    filters = generator_filters(cfg.image_size, cfg.network_capacity, cfg.fmap_max)
    n_blocks = len(filters) - 1
    for i in range(n_blocks):
        b = f"{prefix}.blocks.{i}"
        params[f"block{i}"] = {
            "to_style1": _linear(sd, f"{b}.to_style1"),
            "to_noise1": _linear(sd, f"{b}.to_noise1"),
            "conv1_weight": _modconv_weight(sd, f"{b}.conv1.weight"),
            "to_style2": _linear(sd, f"{b}.to_style2"),
            "to_noise2": _linear(sd, f"{b}.to_noise2"),
            "conv2_weight": _modconv_weight(sd, f"{b}.conv2.weight"),
            "to_rgb": {
                "to_style": _linear(sd, f"{b}.to_rgb.to_style"),
                "conv_weight": _modconv_weight(sd, f"{b}.to_rgb.conv.weight"),
            },
        }
    return params


def _convert_discriminator(sd, prefix: str, cfg: ModelConfig, encoder: bool) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    filters = discriminator_filters(cfg.image_size, cfg.network_capacity, cfg.fmap_max)
    n_blocks = len(filters) - 1
    for i in range(n_blocks):
        b = f"{prefix}.blocks.{i}"
        blk = {
            "conv_res": _conv(sd, f"{b}.conv_res"),
            "conv1": _conv(sd, f"{b}.net.0"),
            "conv2": _conv(sd, f"{b}.net.2"),
        }
        if f"{b}.downsample.1.weight" in sd:
            blk["conv_down"] = _conv(sd, f"{b}.downsample.1")
        params[f"block{i}"] = blk
    params["final_conv"] = _conv(sd, f"{prefix}.final_conv")
    params["fc"] = _fc_flatten_permuted(sd, f"{prefix}.fc", filters[-1])
    return params


def convert_stylex_state_dict(sd: Dict[str, Any], cfg: ModelConfig) -> Dict[str, Any]:
    """Convert a full reference ``StylEx`` state dict to our parameter
    bundle {'encoder','S','G','D','SE','GE'}."""
    out = {
        "S": _convert_mapping(sd, "S", cfg.style_depth),
        "G": _convert_generator(sd, "G", cfg),
        "D": _convert_discriminator(sd, "D", cfg, encoder=False),
        "SE": _convert_mapping(sd, "SE", cfg.style_depth),
        "GE": _convert_generator(sd, "GE", cfg),
    }
    if cfg.encoder_class is None:
        out["encoder"] = _convert_discriminator(sd, "encoder", cfg, encoder=True)
    else:  # DebugEncoder family
        enc: Dict[str, Any] = {}
        for key in list(sd):
            if key.startswith("encoder.") and key.endswith(".weight"):
                name = key[len("encoder."):-len(".weight")]
                flax_name = name.replace(".", "_") if "." in name else name
                if _np(sd[key]).ndim == 4:
                    enc[flax_name] = _conv(sd, f"encoder.{name}")
                else:
                    enc[flax_name] = _linear(sd, f"encoder.{name}")
        out["encoder"] = enc
    return out


def load_reference_checkpoint(path: str, cfg: Optional[ModelConfig] = None) -> Dict[str, Any]:
    """Load a reference ``model_<n>.pt`` and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt["StylEx"] if "StylEx" in ckpt else ckpt
    return convert_stylex_state_dict(sd, cfg or ModelConfig())
