"""InceptionV3 (FID variant) — pool3 feature extractor for FID, in flax.

The reference computes FID through ``pytorch_fid``'s InceptionV3
(`/root/reference/stylex/stylex_train.py:1577-1622`) and through TF-side
pool3 features (`FID_TensorFlow.ipynb` cell 21). This is a from-scratch
flax implementation of the same published architecture (Szegedy et al.,
2015) in its FID flavour:

* branch-pool average pools exclude padding (``count_include_pad=False``),
* the final Mixed_7c block uses a max pool for its pool branch,
* preprocessing: images in [0,1] -> bilinear resize to 299 -> scale to
  [-1, 1]; output is the 2048-d global-average pool.

:func:`convert_inception_state_dict` maps a ``pytorch_fid``/torchvision
inception state dict onto the flax tree; with no checkpoint on disk the
network initialises from a fixed seed (self-consistent FID only —
:mod:`stylex_tpu.eval.fid` prefers real weights when present, looked up at
``STYLEX_TPU_INCEPTION``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

__all__ = [
    "InceptionV3FID",
    "convert_inception_state_dict",
    "default_pool3_features",
]


def _avg_pool_3x3_exc(x):
    """3x3 stride-1 avg pool, padding 1, count_include_pad=False."""
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    return summed / counts


def _max_pool(x, k: int, s: int, p: int = 0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1), ((0, 0), (p, p), (p, p), (0, 0))
    )


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        ph, pw = self.padding
        x = nn.Conv(
            self.features, (kh, kw), strides=(self.stride, self.stride),
            padding=((ph, ph), (pw, pw)), use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


def _bc(f, k, s=1, p=(0, 0), name=None):
    k = (k, k) if isinstance(k, int) else k
    p = (p, p) if isinstance(p, int) else p
    return BasicConv2d(f, k, s, p, name=name)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = _bc(64, 1, name="branch1x1")(x)
        b5 = _bc(48, 1, name="branch5x5_1")(x)
        b5 = _bc(64, 5, p=2, name="branch5x5_2")(b5)
        b3 = _bc(64, 1, name="branch3x3dbl_1")(x)
        b3 = _bc(96, 3, p=1, name="branch3x3dbl_2")(b3)
        b3 = _bc(96, 3, p=1, name="branch3x3dbl_3")(b3)
        bp = _bc(self.pool_features, 1, name="branch_pool")(_avg_pool_3x3_exc(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _bc(384, 3, s=2, name="branch3x3")(x)
        bd = _bc(64, 1, name="branch3x3dbl_1")(x)
        bd = _bc(96, 3, p=1, name="branch3x3dbl_2")(bd)
        bd = _bc(96, 3, s=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = _bc(192, 1, name="branch1x1")(x)
        b7 = _bc(c7, 1, name="branch7x7_1")(x)
        b7 = _bc(c7, (1, 7), p=(0, 3), name="branch7x7_2")(b7)
        b7 = _bc(192, (7, 1), p=(3, 0), name="branch7x7_3")(b7)
        bd = _bc(c7, 1, name="branch7x7dbl_1")(x)
        bd = _bc(c7, (7, 1), p=(3, 0), name="branch7x7dbl_2")(bd)
        bd = _bc(c7, (1, 7), p=(0, 3), name="branch7x7dbl_3")(bd)
        bd = _bc(c7, (7, 1), p=(3, 0), name="branch7x7dbl_4")(bd)
        bd = _bc(192, (1, 7), p=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _bc(192, 1, name="branch_pool")(_avg_pool_3x3_exc(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = _bc(192, 1, name="branch3x3_1")(x)
        b3 = _bc(320, 3, s=2, name="branch3x3_2")(b3)
        b7 = _bc(192, 1, name="branch7x7x3_1")(x)
        b7 = _bc(192, (1, 7), p=(0, 3), name="branch7x7x3_2")(b7)
        b7 = _bc(192, (7, 1), p=(3, 0), name="branch7x7x3_3")(b7)
        b7 = _bc(192, 3, s=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # FID variant: Mixed_7c pools with max

    @nn.compact
    def __call__(self, x):
        b1 = _bc(320, 1, name="branch1x1")(x)
        b3 = _bc(384, 1, name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                _bc(384, (1, 3), p=(0, 1), name="branch3x3_2a")(b3),
                _bc(384, (3, 1), p=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = _bc(448, 1, name="branch3x3dbl_1")(x)
        bd = _bc(384, 3, p=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                _bc(384, (1, 3), p=(0, 1), name="branch3x3dbl_3a")(bd),
                _bc(384, (3, 1), p=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        pooled = _max_pool(x, 3, 1, 1) if self.use_max_pool else _avg_pool_3x3_exc(x)
        bp = _bc(192, 1, name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Trunk up to the 2048-d pool3 features."""

    @nn.compact
    def __call__(self, x):
        x = _bc(32, 3, s=2, name="Conv2d_1a_3x3")(x)
        x = _bc(32, 3, name="Conv2d_2a_3x3")(x)
        x = _bc(64, 3, p=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = _bc(80, 1, name="Conv2d_3b_1x1")(x)
        x = _bc(192, 3, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048)


def pool3_features_fn(variables, resize_to: int = 299):
    """Build a jitted (B,H,W,3)-in-[0,1] -> (B,2048) feature function."""
    model = InceptionV3FID()

    @jax.jit
    def features(images):
        b, h, w, c = images.shape
        if (h, w) != (resize_to, resize_to):
            images = jax.image.resize(images, (b, resize_to, resize_to, c), method="bilinear")
        return model.apply(variables, images * 2.0 - 1.0)

    return features


def load_inception_variables(path: str):
    """Load FID InceptionV3 weights from an ingested ``.msgpack`` (see
    ``stylex_tpu.ingest``) or a raw torchvision state dict. Fails loudly."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"Inception weights not found: {path}")
    if str(path).endswith((".msgpack", ".mp")):
        from stylex_tpu.ingest import load_msgpack_tree

        tree = load_msgpack_tree(path)
        if "params" not in tree:
            raise ValueError(f"{path} is not an ingested Inception tree")
        import jax.numpy as _jnp

        import jax as _jax

        return _jax.tree.map(_jnp.asarray, tree)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_inception_state_dict(sd)


def default_pool3_features():
    """InceptionV3 features from ``STYLEX_TPU_INCEPTION`` (torch state dict
    or ingested msgpack). None when the env var is unset (callers fall back
    to the self-consistent random-feature metric); a SET but missing or
    malformed path raises — requested real weights never degrade silently."""
    path = os.environ.get("STYLEX_TPU_INCEPTION")
    if not path:
        return None
    return pool3_features_fn(load_inception_variables(path))


def init_inception_variables(key: Optional[jax.Array] = None) -> Dict[str, Any]:
    model = InceptionV3FID()
    if key is None:
        key = jax.random.PRNGKey(0)
    return model.init(key, jnp.zeros((1, 299, 299, 3)))


def convert_inception_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torchvision/pytorch_fid inception_v3 state dict onto the flax
    tree. Keys look like ``Mixed_5b.branch1x1.conv.weight``; fc/AuxLogits
    entries are ignored (the FID trunk stops at pool3)."""

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def set_deep(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        *module_path, unit, param = parts
        path = module_path + [unit]
        v = np_(val)
        if unit == "conv" and param == "weight":
            set_deep(params, path + ["kernel"], jnp.asarray(v.transpose(2, 3, 1, 0)))
        elif unit == "bn":
            if param == "weight":
                set_deep(params, path + ["scale"], jnp.asarray(v))
            elif param == "bias":
                set_deep(params, path + ["bias"], jnp.asarray(v))
            elif param == "running_mean":
                set_deep(stats, path + ["mean"], jnp.asarray(v))
            elif param == "running_var":
                set_deep(stats, path + ["var"], jnp.asarray(v))
    return {"params": params, "batch_stats": stats}
