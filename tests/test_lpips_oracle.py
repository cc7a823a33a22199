"""LPIPS forward parity vs a torch oracle (AlexNet trunk + linear taps,
re-stating the published LPIPS recipe), plus Trainer.calculate_fid smoke."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from stylex_tpu.models.lpips import LPIPS_CFG, convert_lpips_state_dict, lpips_distance


class TAlexLPIPS(tnn.Module):
    """Oracle with lpips-package-compatible key names."""

    def __init__(self):
        super().__init__()
        convs = []
        cin = 3
        for cout, k, s, p in LPIPS_CFG:
            convs.append(tnn.Conv2d(cin, cout, k, s, p))
            cin = cout
        # lpips stores the trunk as net.slice{1..5}.<idx>; flat names work for
        # the converter, which matches conv shapes in order.
        self.net = tnn.ModuleList(convs)
        self.lins = tnn.ModuleList(
            [tnn.Conv2d(c, 1, 1, bias=False) for c, *_ in LPIPS_CFG]
        )
        for lin in self.lins:
            with torch.no_grad():
                lin.weight.abs_()

    def features(self, x):
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        x = (x - shift) / scale
        taps = []
        for i, conv in enumerate(self.net):
            x = tF.relu(conv(x))
            taps.append(x)
            if i in (0, 1):
                x = tF.max_pool2d(x, 3, 2)
        return taps

    def forward(self, a, b):
        total = 0.0
        for i, (fa, fb) in enumerate(zip(self.features(a), self.features(b))):
            na = fa / torch.sqrt((fa**2).sum(1, keepdim=True) + 1e-10)
            nb = fb / torch.sqrt((fb**2).sum(1, keepdim=True) + 1e-10)
            d = self.lins[i]((na - nb) ** 2)
            total = total + d.mean(dim=(2, 3)).squeeze(1)
        return total

    def lpips_state_dict(self):
        sd = {}
        for i, conv in enumerate(self.net):
            sd[f"net.features.{i}.weight"] = conv.weight.detach()
            sd[f"net.features.{i}.bias"] = conv.bias.detach()
        for i, lin in enumerate(self.lins):
            sd[f"lin{i}.model.1.weight"] = lin.weight.detach()
        return sd


@pytest.mark.slow
def test_lpips_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TAlexLPIPS().eval()
    a = torch.rand(2, 3, 64, 64) * 2 - 1
    b = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        want = oracle(a, b).numpy()

    params = convert_lpips_state_dict(oracle.lpips_state_dict())
    got = lpips_distance(
        params,
        jnp.asarray(a.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(b.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_trainer_calculate_fid_smoke(tmp_path):
    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.train.trainer import Trainer

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=4, gradient_accumulate_every=2, aug_prob=0.0)
    trainer = Trainer(name="fid", base_dir=str(tmp_path), model_cfg=cfg, train_cfg=tc,
                      classifier_name="mobilenet")
    trainer.set_data_src(dataset_name="synthetic")
    trainer.init_stylex()
    fid = trainer.calculate_fid(num_batches=4)
    assert np.isfinite(fid) and fid >= 0.0

    # real-side stats cache: keyed by extractor tag + sample size, reused
    # when both match, recomputed (not crashed) when the extractor changes
    cache = trainer.fid_dir / "real_stats.npz"
    d = np.load(cache)
    assert {"mu", "cov", "extractor", "num_batches"} <= set(d.files)
    fid2 = trainer.calculate_fid(num_batches=4)
    np.testing.assert_allclose(fid2, fid, rtol=1e-6)
    np.savez(cache, mu=d["mu"], cov=d["cov"],
             extractor=np.str_("other_extractor"), num_batches=4)
    fid3 = trainer.calculate_fid(num_batches=4)
    assert np.isfinite(fid3)
    assert str(np.load(cache)["extractor"]) != "other_extractor"
    trainer.loader.close()
