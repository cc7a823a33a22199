"""Classifier parity tests: flax ResNet-18 / MobileNetV2 vs torch oracles.

The torch networks here are freshly written from the published architectures
(He et al. 2016; Sandler et al. 2018) purely to produce state dicts with
torchvision-compatible key names and oracle outputs for the converters.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from stylex_tpu.models.classifiers import (
    MobileNetV2,
    ResNet18,
    build_classifier,
    convert_mobilenet_v2_state_dict,
    convert_resnet18_state_dict,
)


# ----- torch oracles with torchvision-compatible state_dict keys -----------


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False), tnn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = tF.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return tF.relu(out + idt)


class TResNet18(tnn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cins = [64, 64, 128, 256]
        couts = [64, 128, 256, 512]
        strides = [1, 2, 2, 2]
        for i in range(4):
            setattr(
                self,
                f"layer{i + 1}",
                tnn.Sequential(
                    TBasicBlock(cins[i], couts[i], strides[i]), TBasicBlock(couts[i], couts[i], 1)
                ),
            )
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _t_convbnrelu6(cin, cout, k, s, groups=1):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, groups=groups, bias=False),
        tnn.BatchNorm2d(cout),
        tnn.ReLU6(),
    )


class TInvertedResidual(tnn.Module):
    def __init__(self, cin, cout, stride, t):
        super().__init__()
        hidden = cin * t
        layers = []
        if t != 1:
            layers.append(_t_convbnrelu6(cin, hidden, 1, 1))
        layers.append(_t_convbnrelu6(hidden, hidden, 3, stride, groups=hidden))
        layers.append(tnn.Conv2d(hidden, cout, 1, bias=False))
        layers.append(tnn.BatchNorm2d(cout))
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class TMobileNetV2(tnn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        plan = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        feats = [_t_convbnrelu6(3, 32, 3, 2)]
        cin = 32
        for t, c, n, s in plan:
            for i in range(n):
                feats.append(TInvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(_t_convbnrelu6(320, 1280, 1, 1))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(tnn.Dropout(0.2), tnn.Linear(1280, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


def _randomize_bn_stats(model):
    """Give BN layers non-trivial running stats so the test catches
    mean/var mapping errors."""
    g = torch.Generator().manual_seed(0)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)


@pytest.mark.slow
def test_resnet18_converter_matches_torch_oracle():
    torch.manual_seed(0)
    net = TResNet18().eval()
    _randomize_bn_stats(net)
    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()

    variables = convert_resnet18_state_dict(net.state_dict())
    got = ResNet18().apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_mobilenet_v2_converter_matches_torch_oracle():
    torch.manual_seed(1)
    net = TMobileNetV2().eval()
    _randomize_bn_stats(net)
    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()

    variables = convert_mobilenet_v2_state_dict(net.state_dict())
    got = MobileNetV2().apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_build_classifier_random_init_shapes():
    bundle = build_classifier("resnet", image_size=32)
    imgs = jnp.zeros((2, 32, 32, 3))
    logits = bundle.classify_images(imgs)
    assert logits.shape == (2, 2)

    bundle = build_classifier("mobilenet", image_size=32)
    logits = bundle.classify_images(imgs)
    assert logits.shape == (2, 2)
