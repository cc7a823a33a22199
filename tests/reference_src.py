"""Load the reference's *literal source* for golden-parity oracles.

VERDICT r1 "Missing #2": re-typed torch clones can share a misreading with
the flax port. This module instead AST-extracts the model classes straight
out of ``/root/reference/stylex/stylex_train.py`` and execs them, so the
parity tests bind to the reference's own code. The reference module cannot
be imported directly — it builds ``lpips.LPIPS(...).cuda(0)`` at import
time (`stylex_train.py:404`) and needs kornia/fire/aim, none of which are
in this image — so we exec only the selected top-level defs with minimal
stand-ins:

* ``filter2d`` — kornia's ``filter2d(x, k, normalized=True)``: reflect-pad
  'same' depthwise conv with the (optionally sum-normalised) kernel. Only
  the call pattern ``Blur`` uses (`stylex_train.py:150-154`) is supported.
* ``VectorQuantize`` — placeholder that raises if instantiated (tests do
  not use fq_layers).

Everything else (torch, einops, math, functools) is the real library.
"""

from __future__ import annotations

import ast
import math
from functools import lru_cache, partial
from math import floor, log2
from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F
from einops import rearrange, repeat
from torch import einsum, nn
from torch.autograd import grad as torch_grad

REFERENCE_PATH = Path("/root/reference/stylex/stylex_train.py")

# top-level defs pulled verbatim from the reference source
WANTED = (
    # helpers
    "exists", "default", "leaky_relu", "Flatten", "Residual", "ChanNorm",
    "PreNorm", "PermuteToFrom", "Blur", "DepthWiseConv2d", "LinearAttention",
    "attn_and_ff", "styles_def_to_tensor", "slerp",
    # latent / noise plumbing
    "noise", "noise_list", "mixed_list", "latent_to_w", "image_noise",
    # losses
    "gen_hinge_loss", "hinge_loss", "dual_contrastive_loss",
    "classifier_kl_loss", "l1_loss", "kl_loss",
    "gradient_penalty", "calc_pl_lengths",
    # model classes
    "EqualLinear", "StyleVectorizer", "RGBBlock", "Conv2DMod",
    "GeneratorBlock", "DiscriminatorBlock", "Generator", "DiscriminatorE",
)


def _kornia_filter2d(input: torch.Tensor, kernel: torch.Tensor,
                     border_type: str = "reflect", normalized: bool = False) -> torch.Tensor:
    """Minimal faithful kornia.filters.filter2d for (1,kh,kw) kernels."""
    b, c, h, w = input.shape
    k = kernel.to(input)
    if k.dim() == 3:
        k = k[0]
    if normalized:
        k = k / k.sum()
    kh, kw = k.shape[-2:]
    k = k.expand(c, 1, kh, kw)
    x = F.pad(input, (kw // 2, kw // 2, kh // 2, kh // 2), mode=border_type)
    return F.conv2d(x, k, groups=c)


class _NoVectorQuantize:
    def __init__(self, *a, **k):  # pragma: no cover - guard
        raise RuntimeError("fq_layers not supported by the source oracle")


def _assign_targets(node: ast.Assign):
    for t in node.targets:
        if isinstance(t, ast.Name):
            yield t.id


@lru_cache(maxsize=1)
def load_reference_namespace() -> dict:
    """Exec the wanted reference defs and return the resulting namespace."""
    source = REFERENCE_PATH.read_text()
    tree = ast.parse(source)
    keep = []
    for node in tree.body:
        if isinstance(node, (ast.ClassDef, ast.FunctionDef)) and node.name in WANTED:
            keep.append(node)
        elif isinstance(node, ast.Assign) and any(
            t in WANTED for t in _assign_targets(node)
        ):
            keep.append(node)
    found = {n.name for n in keep if isinstance(n, (ast.ClassDef, ast.FunctionDef))}
    found |= {t for n in keep if isinstance(n, ast.Assign) for t in _assign_targets(n)}
    missing = set(WANTED) - found
    assert not missing, f"reference source did not contain: {sorted(missing)}"

    module = ast.Module(body=keep, type_ignores=[])
    code = compile(module, filename=str(REFERENCE_PATH), mode="exec")
    ns = {
        "torch": torch, "nn": nn, "F": F, "np": np, "math": math,
        "floor": floor, "log2": log2, "partial": partial, "einsum": einsum,
        "rearrange": rearrange, "repeat": repeat, "torch_grad": torch_grad,
        "filter2d": _kornia_filter2d, "VectorQuantize": _NoVectorQuantize,
        "EPS": 1e-8,
    }
    exec(code, ns)
    return ns


class ReferenceStylExContainer(nn.Module):
    """torch container with the reference StylEx's submodule names, so its
    ``state_dict()`` keys match a reference checkpoint's ``S./G./D./
    encoder./SE./GE.`` layout (`stylex_train.py:912-1000`)."""

    def __init__(self, image_size: int, latent_dim: int, network_capacity: int,
                 encoder_dim: int = 512, fmap_max: int = 512, attn_layers=()):
        super().__init__()
        ns = load_reference_namespace()
        self.S = ns["StyleVectorizer"](latent_dim, depth=8, lr_mul=0.1)
        self.G = ns["Generator"](image_size, latent_dim, network_capacity,
                                 attn_layers=list(attn_layers), fmap_max=fmap_max)
        self.D = ns["DiscriminatorE"](image_size, network_capacity,
                                      attn_layers=list(attn_layers), fmap_max=fmap_max)
        self.encoder = ns["DiscriminatorE"](image_size, network_capacity, encoder=True,
                                            encoder_dim=encoder_dim, fmap_max=fmap_max)
        self.SE = ns["StyleVectorizer"](latent_dim, depth=8, lr_mul=0.1)
        self.GE = ns["Generator"](image_size, latent_dim, network_capacity,
                                  attn_layers=list(attn_layers), fmap_max=fmap_max)
