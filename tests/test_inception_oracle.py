"""InceptionV3-FID numerical parity vs a freshly written torch oracle.

The oracle re-states the published Inception-v3 architecture (Szegedy et
al. 2015) in its pytorch_fid flavour, with torchvision-compatible state-dict
keys, so it exercises both the converter mapping and the branch wiring.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from stylex_tpu.models.inception import InceptionV3FID, convert_inception_state_dict


class BC(tnn.Module):
    """BasicConv2d: conv + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, k, s=1, p=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def avg_exc(x):
    return tF.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class IA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BC(cin, 64, 1)
        self.branch5x5_1 = BC(cin, 48, 1)
        self.branch5x5_2 = BC(48, 64, 5, p=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, p=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, p=1)
        self.branch_pool = BC(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat(
            [
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(avg_exc(x)),
            ],
            1,
        )


class IB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BC(cin, 384, 3, s=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, p=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, s=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                tF.max_pool2d(x, 3, 2),
            ],
            1,
        )


class IC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BC(cin, 192, 1)
        self.branch7x7_1 = BC(cin, c7, 1)
        self.branch7x7_2 = BC(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7_3 = BC(c7, 192, (7, 1), p=(3, 0))
        self.branch7x7dbl_1 = BC(cin, c7, 1)
        self.branch7x7dbl_2 = BC(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_3 = BC(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7dbl_4 = BC(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_5 = BC(c7, 192, (1, 7), p=(0, 3))
        self.branch_pool = BC(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x))))
        )
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(avg_exc(x))], 1
        )


class ID(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BC(cin, 192, 1)
        self.branch3x3_2 = BC(192, 320, 3, s=2)
        self.branch7x7x3_1 = BC(cin, 192, 1)
        self.branch7x7x3_2 = BC(192, 192, (1, 7), p=(0, 3))
        self.branch7x7x3_3 = BC(192, 192, (7, 1), p=(3, 0))
        self.branch7x7x3_4 = BC(192, 192, 3, s=2)

    def forward(self, x):
        return torch.cat(
            [
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(
                    self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
                ),
                tF.max_pool2d(x, 3, 2),
            ],
            1,
        )


class IE(tnn.Module):
    def __init__(self, cin, use_max_pool=False):
        super().__init__()
        self.branch1x1 = BC(cin, 320, 1)
        self.branch3x3_1 = BC(cin, 384, 1)
        self.branch3x3_2a = BC(384, 384, (1, 3), p=(0, 1))
        self.branch3x3_2b = BC(384, 384, (3, 1), p=(1, 0))
        self.branch3x3dbl_1 = BC(cin, 448, 1)
        self.branch3x3dbl_2 = BC(448, 384, 3, p=1)
        self.branch3x3dbl_3a = BC(384, 384, (1, 3), p=(0, 1))
        self.branch3x3dbl_3b = BC(384, 384, (3, 1), p=(1, 0))
        self.branch_pool = BC(cin, 192, 1)
        self.use_max_pool = use_max_pool

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = tF.max_pool2d(x, 3, 1, 1) if self.use_max_pool else avg_exc(x)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(pooled)], 1)


class TInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BC(3, 32, 3, s=2)
        self.Conv2d_2a_3x3 = BC(32, 32, 3)
        self.Conv2d_2b_3x3 = BC(32, 64, 3, p=1)
        self.Conv2d_3b_1x1 = BC(64, 80, 1)
        self.Conv2d_4a_3x3 = BC(80, 192, 3)
        self.Mixed_5b = IA(192, 32)
        self.Mixed_5c = IA(256, 64)
        self.Mixed_5d = IA(288, 64)
        self.Mixed_6a = IB(288)
        self.Mixed_6b = IC(768, 128)
        self.Mixed_6c = IC(768, 160)
        self.Mixed_6d = IC(768, 160)
        self.Mixed_6e = IC(768, 192)
        self.Mixed_7a = ID(768)
        self.Mixed_7b = IE(1280)
        self.Mixed_7c = IE(2048, use_max_pool=True)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, 2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, 2)
        for name in ("5b", "5c", "5d"):
            x = getattr(self, f"Mixed_{name}")(x)
        x = self.Mixed_6a(x)
        for name in ("6b", "6c", "6d", "6e"):
            x = getattr(self, f"Mixed_{name}")(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        return x.mean(dim=(2, 3))


@pytest.mark.slow
def test_inception_pool3_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TInception().eval()
    # non-trivial running stats
    g = torch.Generator().manual_seed(1)
    for m in oracle.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.05)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.3 + 0.85)

    x = torch.rand(2, 3, 96, 96) * 2 - 1  # 96px keeps the CPU test fast
    with torch.no_grad():
        want = oracle(x).numpy()

    variables = convert_inception_state_dict(oracle.state_dict())
    got = InceptionV3FID().apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
