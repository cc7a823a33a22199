"""Frozen classifiers: ResNet-18 and MobileNetV2 in flax + torch converters.

The reference wraps torchvision models behind ``classify_images`` adapters
(`/root/reference/stylex/resnet_classifier.py`,
`/root/reference/stylex/mobilenet_classifier.py`). Two quirks matter for
AttFind parity and are preserved faithfully:

* the ResNet path **bilinearly resizes generated images to 224** before
  classification (`resnet_classifier.py:61`),
* the MobileNet path interpolates to ``image_size`` with torch's default
  **nearest** mode (`mobilenet_classifier.py:62`) — usually a no-op since
  generated images are already ``image_size``,
* both then apply ImageNet normalisation.

Weights come from the reference's ``trained_classifiers/*.pt`` checkpoints
via :func:`convert_resnet18_state_dict` / :func:`convert_mobilenet_v2_state_dict`
(plain ``state_dict`` name mapping — no torchvision needed). Random init is
used when no checkpoint is given (e.g. for classifier pre-training, SURVEY
§2.13, which trains these same flax models).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

__all__ = [
    "ResNet18",
    "MobileNetV2",
    "ClassifierBundle",
    "build_classifier",
    "convert_resnet18_state_dict",
    "convert_mobilenet_v2_state_dict",
    "imagenet_normalize",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x: jax.Array) -> jax.Array:
    """(x - mean) / std per channel; accepts [0,1] floats or the loader's
    quantized uint8 transfer format (normalised on device)."""
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        x = x.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def _max_pool_3x3_s2_p1(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1) on NHWC."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class _ConvBN(nn.Module):
    """conv -> batchnorm (torch eps/momentum), optional relu/relu6."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    act: Optional[str] = None  # None | 'relu' | 'relu6'

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            feature_group_count=self.groups,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "relu6":
            x = jnp.minimum(nn.relu(x), 6.0)
        return x


class _BasicBlock(nn.Module):
    """torchvision ResNet BasicBlock."""

    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _ConvBN(self.features, 3, self.stride, 1, act="relu", name="conv1")(x, train)
        out = _ConvBN(self.features, 3, 1, 1, name="conv2")(out, train)
        if self.downsample:
            identity = _ConvBN(self.features, 1, self.stride, 0, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNet18(nn.Module):
    """torchvision-compatible ResNet-18 trunk, NHWC."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBN(64, 7, 2, 3, act="relu", name="stem")(x, train)
        x = _max_pool_3x3_s2_p1(x)
        plan = [(64, 1), (128, 2), (256, 2), (512, 2)]
        for i, (feats, stride) in enumerate(plan):
            x = _BasicBlock(feats, stride, downsample=stride != 1, name=f"layer{i + 1}_0")(x, train)
            x = _BasicBlock(feats, 1, name=f"layer{i + 1}_1")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


class _InvertedResidual(nn.Module):
    """MobileNetV2 inverted residual (expand -> depthwise -> project)."""

    in_ch: int
    out_ch: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.in_ch * self.expand_ratio
        use_res = self.stride == 1 and self.in_ch == self.out_ch
        out = x
        if self.expand_ratio != 1:
            out = _ConvBN(hidden, 1, act="relu6", name="expand")(out, train)
        out = _ConvBN(hidden, 3, self.stride, 1, groups=hidden, act="relu6", name="depthwise")(out, train)
        out = _ConvBN(self.out_ch, 1, name="project")(out, train)
        return x + out if use_res else out


# (expand_ratio, channels, repeats, stride) — the MobileNetV2 paper table.
_MBV2_PLAN = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    """torchvision-compatible MobileNetV2, NHWC."""

    num_classes: int = 2
    dropout_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBN(32, 3, 2, 1, act="relu6", name="stem")(x, train)
        in_ch = 32
        idx = 0
        for t, c, n, s in _MBV2_PLAN:
            for i in range(n):
                stride = s if i == 0 else 1
                x = _InvertedResidual(in_ch, c, stride, t, name=f"block{idx}")(x, train)
                in_ch = c
                idx += 1
        x = _ConvBN(1280, 1, act="relu6", name="head")(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="classifier")(x)


# --------------------------------------------------------------------------
# classify_images adapters
# --------------------------------------------------------------------------


class ClassifierBundle:
    """A frozen classifier with its reference-faithful preprocessing.

    ``classify_images`` mirrors the reference adapters: images in [0,1],
    resized per classifier family, ImageNet-normalised, then the network.
    """

    def __init__(self, kind: str, apply_fn, variables, image_size: int,
                 normalize: bool = True, num_classes: int = 2):
        self.kind = kind
        self.apply_fn = apply_fn
        self.variables = variables
        self.image_size = image_size
        self.normalize = normalize
        self.num_classes = num_classes

    def classify_images(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) in [0,1] -> (B, num_classes) logits."""
        return self.classify_with(self.variables, images)

    def classify_with(self, variables, images: jax.Array) -> jax.Array:
        """Like :meth:`classify_images` but pure in the weights: jitted
        callers pass ``variables`` as a runtime argument so the classifier
        weights are NOT baked into the executable as constants (constant
        embedding bloats AttFind executables to 100s of MB — every run then
        re-compiles/re-ships them through the relay; see
        ``attfind.extraction._split_classifier``)."""
        b, h, w, c = images.shape
        if self.kind == "resnet":
            # bilinear resize to 224 (`resnet_classifier.py:61`)
            x = images
            if (h, w) != (224, 224):
                x = jax.image.resize(images, (b, 224, 224, c), method="bilinear")
        else:
            # nearest interpolate to image_size (`mobilenet_classifier.py:62`);
            # identity resizes are skipped — XLA lowers same-size nearest
            # resize as a gather, which is pure overhead.
            x = images
            if (h, w) != (self.image_size, self.image_size):
                x = jax.image.resize(
                    images, (b, self.image_size, self.image_size, c), method="nearest"
                )
        if self.normalize:
            x = imagenet_normalize(x)
        return self.apply_fn(variables, x)

    def __call__(self, images: jax.Array) -> jax.Array:
        return self.classify_images(images)


def build_classifier(
    kind: str,
    image_size: int,
    num_classes: int = 2,
    checkpoint_path: Optional[str] = None,
    rng: Optional[jax.Array] = None,
) -> ClassifierBundle:
    """Build a frozen classifier bundle, optionally from a torch checkpoint.

    Equivalent of the ``Trainer`` classifier selection
    (`stylex_train.py:1152-1161`): ``kind`` in {'resnet', 'mobilenet'}.
    """
    kind = kind.lower()
    dummy = jnp.zeros((1, 224 if kind == "resnet" else image_size,
                       224 if kind == "resnet" else image_size, 3))
    if kind == "resnet":
        model = ResNet18(num_classes=num_classes)
    else:
        model = MobileNetV2(num_classes=num_classes)
    from stylex_tpu.utils.device import init_on_host

    variables = init_on_host(
        lambda k: model.init(k, dummy), rng if rng is not None else jax.random.PRNGKey(0)
    )
    if checkpoint_path is not None:
        if str(checkpoint_path).endswith((".msgpack", ".mp")):
            # native format written by ClassifierTrainer.save
            from pathlib import Path

            from flax import serialization

            payload = serialization.msgpack_restore(Path(checkpoint_path).read_bytes())
            variables = serialization.from_state_dict(variables, payload)
        else:
            # torch state-dict as saved by the reference's notebooks
            import torch

            state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
            if kind == "resnet":
                variables = convert_resnet18_state_dict(state, num_classes)
            else:
                variables = convert_mobilenet_v2_state_dict(state, num_classes)

    def apply_fn(vars_, x):
        return model.apply(vars_, x, train=False)

    return ClassifierBundle(kind, apply_fn, variables, image_size, num_classes=num_classes)


# --------------------------------------------------------------------------
# torch state_dict -> flax variables converters
# --------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_w(t) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def _dw_conv_w(t) -> np.ndarray:
    """Depthwise OIHW (O, 1, H, W) -> HWIO (H, W, 1, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def _convbn(sd, conv_key, bn_key):
    return (
        {"conv": {"kernel": _conv_w(sd[conv_key + ".weight"])},
         "bn": {"scale": _np(sd[bn_key + ".weight"]), "bias": _np(sd[bn_key + ".bias"])}},
        {"bn": {"mean": _np(sd[bn_key + ".running_mean"]), "var": _np(sd[bn_key + ".running_var"])}},
    )


def convert_resnet18_state_dict(sd: Dict[str, Any], num_classes: int = 2) -> Dict[str, Any]:
    """Map a torchvision resnet18 ``state_dict`` (as saved by the reference's
    classifier training, `resnet_classifier.py:19-26`) to flax variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    p, s = _convbn(sd, "conv1", "bn1")
    params["stem"], stats["stem"] = p, s

    for layer in range(1, 5):
        for blk in range(2):
            name = f"layer{layer}_{blk}"
            prefix = f"layer{layer}.{blk}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            bp["conv1"], bs["conv1"] = _convbn(sd, f"{prefix}.conv1", f"{prefix}.bn1")
            bp["conv2"], bs["conv2"] = _convbn(sd, f"{prefix}.conv2", f"{prefix}.bn2")
            if f"{prefix}.downsample.0.weight" in sd:
                bp["downsample"], bs["downsample"] = _convbn(
                    sd, f"{prefix}.downsample.0", f"{prefix}.downsample.1"
                )
            params[name], stats[name] = bp, bs

    params["fc"] = {"kernel": _np(sd["fc.weight"]).T, "bias": _np(sd["fc.bias"])}
    return _as_variables(params, stats)


def convert_mobilenet_v2_state_dict(sd: Dict[str, Any], num_classes: int = 2) -> Dict[str, Any]:
    """Map a torchvision mobilenet_v2 ``state_dict``
    (`mobilenet_classifier.py:18-26`) to flax variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"], stats["stem"] = _convbn(sd, "features.0.0", "features.0.1")

    idx = 0
    feat = 1
    for t, c, n, s in _MBV2_PLAN:
        for i in range(n):
            prefix = f"features.{feat}.conv"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if t != 1:
                bp["expand"], bs["expand"] = _convbn(sd, f"{prefix}.0.0", f"{prefix}.0.1")
                dw, proj_conv, proj_bn = f"{prefix}.1.0", f"{prefix}.2", f"{prefix}.3"
            else:
                dw, proj_conv, proj_bn = f"{prefix}.0.0", f"{prefix}.1", f"{prefix}.2"
            # depthwise conv at "<...>.K.0", its bn at "<...>.K.1"
            bp["depthwise"], bs["depthwise"] = _convbn(sd, dw, dw[:-2] + ".1")
            bp["project"], bs["project"] = _convbn(sd, proj_conv, proj_bn)
            params[f"block{idx}"], stats[f"block{idx}"] = bp, bs
            idx += 1
            feat += 1

    params["head"], stats["head"] = _convbn(sd, "features.18.0", "features.18.1")
    params["classifier"] = {
        "kernel": _np(sd["classifier.1.weight"]).T,
        "bias": _np(sd["classifier.1.bias"]),
    }
    return _as_variables(params, stats)


def _as_variables(params: Dict[str, Any], stats: Dict[str, Any]) -> Dict[str, Any]:
    jparams = jax.tree.map(jnp.asarray, params)
    jstats = jax.tree.map(jnp.asarray, stats)
    return {"params": jparams, "batch_stats": jstats}
