"""LPIPS perceptual distance (AlexNet backbone) in JAX.

The reference uses the ``lpips`` pip package's AlexNet variant as part of the
reconstruction loss (`/root/reference/stylex/stylex_train.py:404,409-418`),
with inputs min-max rescaled to [-1, 1] per image. This is a from-scratch
JAX implementation of the published LPIPS recipe (Zhang et al., CVPR 2018):

    d(x, y) = sum_l mean_hw || w_l ⊙ (norm(f_l(x)) - norm(f_l(y))) ||²

over the five AlexNet relu feature taps, where ``norm`` is channel-unit
normalisation and ``w_l`` are learned non-negative per-channel weights.

Weights: :func:`convert_lpips_state_dict` maps the torch ``lpips.LPIPS(net=
'alex')`` state dict (AlexNet convs + linear taps). When no checkpoint is
available (this container has no network egress), :func:`init_lpips_params`
yields a seeded random backbone with uniform taps — still a valid perceptual
metric for training (random-feature perceptual losses are well-studied), and
bit-reproducible. The whole distance jits into the train step; on TPU the
AlexNet convs are MXU work, so unlike the reference the perceptual term adds
no host round-trip.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["lpips_distance", "init_lpips_params", "convert_lpips_state_dict", "load_lpips_params", "LPIPS_CFG"]

# AlexNet feature config: (out_ch, kernel, stride, pad), with maxpool after
# layers 0 and 1.
LPIPS_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]

# lpips package input scaling layer (applied to [-1,1] inputs).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _max_pool_3x3_s2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)),
    )


def _alexnet_features(params: Dict[str, Any], x: jax.Array) -> List[jax.Array]:
    """Run the AlexNet trunk, returning the five relu taps."""
    taps = []
    for i, (_, k, s, p) in enumerate(LPIPS_CFG):
        w = params[f"conv{i}"]["kernel"].astype(x.dtype)
        b = params[f"conv{i}"]["bias"].astype(x.dtype)
        x = lax.conv_general_dilated(
            x, w, (s, s), ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        x = jnp.maximum(x, 0.0)
        taps.append(x)
        if i in (0, 1):
            x = _max_pool_3x3_s2(x)
    return taps


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


def lpips_distance(params: Dict[str, Any], x: jax.Array, y: jax.Array) -> jax.Array:
    """Perceptual distance between image batches.

    Args:
      params: from :func:`init_lpips_params` / :func:`convert_lpips_state_dict`.
      x, y: (B, H, W, 3) images in [-1, 1] (callers apply ``lpips_normalize``
        first, matching `stylex_train.py:411-413`).

    Returns:
      (B,) distances.
    """
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    if x.shape[1] < 32 or x.shape[2] < 32:
        # AlexNet's stride-4 stem collapses tiny test images to 0x0 feature
        # maps; upsample so every tap has at least one pixel. Real configs
        # (64px+) never hit this.
        b, h, w, c = x.shape
        new = (b, max(h, 32), max(w, 32), c)
        x = jax.image.resize(x, new, method="bilinear")
        y = jax.image.resize(y, new, method="bilinear")
    # one batched backbone pass over [x; y] — per-sample math identical to
    # two passes, half the kernel launches (the train micro-batches are
    # tiny, so the backbone is utilization-bound)
    b = x.shape[0]
    both = jnp.concatenate([(x - shift) / scale, (y - shift) / scale], axis=0)
    feats = _alexnet_features(params, both)
    total = 0.0
    for i, t in enumerate(feats):
        tn = _unit_normalize(t)
        diff = jnp.square(tn[:b] - tn[b:])
        w = params[f"lin{i}"].astype(x.dtype)  # (C,) non-negative taps
        total = total + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
    return total


def init_lpips_params(key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Seeded random backbone + uniform taps (offline fallback). Built as
    one host-side program (utils/device.py) to avoid per-shape remote
    compiles through the TPU relay."""
    from stylex_tpu.utils.device import init_on_host

    def build(k):
        params: Dict[str, Any] = {}
        in_ch = 3
        for i, (out_ch, ksz, _, _) in enumerate(LPIPS_CFG):
            k, kw = jax.random.split(k)
            fan_in = in_ch * ksz * ksz
            params[f"conv{i}"] = {
                "kernel": jax.random.normal(kw, (ksz, ksz, in_ch, out_ch), dtype)
                * np.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((out_ch,), dtype),
            }
            params[f"lin{i}"] = jnp.full((out_ch,), 1.0 / out_ch, dtype)
            in_ch = out_ch
        return params

    return init_on_host(build, key)


def convert_lpips_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a torch ``lpips.LPIPS(net='alex')`` state dict.

    Expected keys: ``net.slice{1..5}.<idx>.weight/bias`` (AlexNet convs, as
    the lpips package lays them out) or ``net.features.<idx>.weight/bias``
    (raw torchvision AlexNet), plus ``lin{0..4}.model.1.weight`` taps.
    """

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    # locate conv weights by matching shapes in order
    conv_keys = [k for k in sd if k.endswith(".weight") and np_(sd[k]).ndim == 4 and "lin" not in k]
    conv_keys.sort(key=lambda k: [int(s) for s in k.split(".") if s.isdigit()])
    params: Dict[str, Any] = {}
    in_ch = 3
    ki = 0
    for i, (out_ch, k, _, _) in enumerate(LPIPS_CFG):
        while ki < len(conv_keys):
            w = np_(sd[conv_keys[ki]])
            if w.shape == (out_ch, in_ch, k, k):
                break
            ki += 1
        if ki >= len(conv_keys):
            raise ValueError(
                f"LPIPS state dict has no conv matching ({out_ch},{in_ch},{k},{k}) "
                f"for tap {i}. The official standalone lpips 'alex.pth' holds only "
                "the lin{0..4} calibration taps — pass a full "
                "lpips.LPIPS(net='alex').state_dict() (AlexNet backbone included), "
                f"not the taps-only file. Keys seen: {sorted(sd)[:6]}..."
            )
        w = np_(sd[conv_keys[ki]])
        b = np_(sd[conv_keys[ki].replace(".weight", ".bias")])
        params[f"conv{i}"] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
        lin_key = f"lin{i}.model.1.weight"
        if lin_key in sd:
            params[f"lin{i}"] = jnp.asarray(np_(sd[lin_key]).reshape(-1))
        else:
            params[f"lin{i}"] = jnp.full((out_ch,), 1.0 / out_ch)
        in_ch = out_ch
        ki += 1
    return params


def load_lpips_params(path: str) -> Dict[str, Any]:
    """Load LPIPS-alex weights from an ingested ``.msgpack`` (see
    ``stylex_tpu.ingest``) or a raw torch ``lpips.LPIPS(net='alex')`` state
    dict. Fails loudly — an explicitly requested weights file never falls
    back to the random-init backbone."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(f"LPIPS weights not found: {path}")
    if str(path).endswith((".msgpack", ".mp")):
        from stylex_tpu.ingest import load_msgpack_tree

        tree = load_msgpack_tree(path)
        if not any(k.startswith("conv") for k in tree):
            raise ValueError(f"{path} is not an ingested LPIPS tree (keys: {list(tree)[:4]})")
        return {k: jax.tree.map(jnp.asarray, v) for k, v in tree.items()}
    import torch

    return convert_lpips_state_dict(torch.load(path, map_location="cpu", weights_only=True))
