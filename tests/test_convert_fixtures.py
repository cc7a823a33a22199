"""Frozen converter-parity fixtures in the FAST profile (VERDICT r4 Next #9).

The torch-oracle converter tests (tests/test_classifiers.py,
tests/test_convert_parity.py) are slow-deselected by default, so until real
pretrained weights can be ingested a converter regression could land unseen.
These tests freeze the oracles once:

    python tests/test_convert_fixtures.py regen

builds synthetic torch state_dicts whose VALUES come from a seeded numpy
RandomState (so no torch is needed at test time — only the key/shape spec
is stored), runs the TORCH oracle models on fixed inputs, and writes the
expected outputs to ``tests/golden/convert_outputs_v1.npz`` (a few KB) plus
``tests/golden/convert_spec_v1.json``. The fast tests rebuild the same
state_dicts from the spec, run them through the shipping converters
(`stylex_tpu/models/convert.py`, `stylex_tpu/models/classifiers.py` — the
paths that will ingest the reference's released ``.pt`` files,
`resnet_classifier.py:50-54`, `mobilenet_classifier.py:18`), and compare the
flax outputs against the frozen torch outputs.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

GOLDEN = Path(__file__).parent / "golden"
SPEC_PATH = GOLDEN / "convert_spec_v1.json"
OUT_PATH = GOLDEN / "convert_outputs_v1.npz"

# tiny-stylex dims — must match tests/test_convert_parity.py's oracle
IMAGE_SIZE, CAP, LATENT, ENC = 16, 4, 34, 32


def synth_state_dict(spec):
    """Deterministically fill a torch-layout state_dict from its key/shape
    spec with a numpy RandomState — identical at regen (torch present) and
    test (torch-free) time. Value ranges keep BN statistics valid and
    activations bounded; beyond that the exact values only need to be
    reproducible."""
    rng = np.random.RandomState(0)
    sd = {}
    for key, shape in spec:
        shape = tuple(shape)
        if key.endswith("num_batches_tracked"):
            sd[key] = np.asarray(0, np.int64)
        elif key.endswith("running_var"):
            sd[key] = (rng.rand(*shape) * 0.5 + 0.75).astype(np.float32)
        elif key.endswith("running_mean"):
            sd[key] = (rng.randn(*shape) * 0.1).astype(np.float32)
        elif len(shape) == 1 and key.endswith("weight"):
            # BN gamma / 1-D scales: near 1
            sd[key] = (1.0 + rng.randn(*shape) * 0.05).astype(np.float32)
        elif key.endswith("bias"):
            sd[key] = (rng.randn(*shape) * 0.05).astype(np.float32)
        else:
            # conv / linear / modconv weights, initial_block consts
            sd[key] = (rng.randn(*shape) * 0.1).astype(np.float32)
    return sd


def fixed_inputs():
    rng = np.random.RandomState(123)
    n_blocks = 3  # log2(16) - 1
    return {
        "clf_imgs": rng.rand(2, 64, 64, 3).astype(np.float32),  # NHWC
        "z": rng.randn(3, LATENT).astype(np.float32),
        "w": rng.randn(2, n_blocks, LATENT).astype(np.float32),
        "inoise": rng.rand(2, IMAGE_SIZE, IMAGE_SIZE, 1).astype(np.float32),
        "x": rng.rand(2, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32),  # NHWC
    }


@pytest.fixture(scope="module")
def frozen():
    assert SPEC_PATH.exists() and OUT_PATH.exists(), (
        "fixtures missing — run `python tests/test_convert_fixtures.py regen`"
    )
    spec = json.loads(SPEC_PATH.read_text())
    outs = dict(np.load(OUT_PATH))
    return spec, outs


def test_classifier_converters_match_frozen_torch(frozen):
    from stylex_tpu.models.classifiers import (
        MobileNetV2,
        ResNet18,
        convert_mobilenet_v2_state_dict,
        convert_resnet18_state_dict,
    )

    spec, outs = frozen
    inp = fixed_inputs()
    x = jnp.asarray(inp["clf_imgs"])

    variables = convert_resnet18_state_dict(synth_state_dict(spec["resnet18"]))
    got = np.asarray(ResNet18().apply(variables, x))
    np.testing.assert_allclose(got, outs["resnet_logits"], rtol=1e-3, atol=1e-4)

    variables = convert_mobilenet_v2_state_dict(synth_state_dict(spec["mobilenet_v2"]))
    got = np.asarray(MobileNetV2().apply(variables, x))
    np.testing.assert_allclose(got, outs["mobilenet_logits"], rtol=1e-3, atol=1e-4)


def test_stylex_converter_matches_frozen_torch(frozen):
    from stylex_tpu.config import ModelConfig
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.convert import convert_stylex_state_dict

    spec, outs = frozen
    inp = fixed_inputs()
    cfg = ModelConfig(image_size=IMAGE_SIZE, network_capacity=CAP,
                      latent_dim=LATENT, encoder_dim=ENC, style_depth=3)
    modules = build_stylex(cfg)
    params = convert_stylex_state_dict(synth_state_dict(spec["stylex"]), cfg)

    got_w = np.asarray(modules.map_z(params, jnp.asarray(inp["z"])))
    np.testing.assert_allclose(got_w, outs["s_w"], rtol=1e-4, atol=1e-5)

    rgb, coords = modules.generate(
        params, jnp.asarray(inp["w"]), jnp.asarray(inp["inoise"])
    )
    np.testing.assert_allclose(np.asarray(rgb), outs["g_rgb"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(coords), outs["g_coords"], rtol=1e-3, atol=1e-4)

    xj = jnp.asarray(inp["x"])
    np.testing.assert_allclose(
        np.asarray(modules.discriminate(params, xj)), outs["d_out"],
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(modules.encode(params, xj)), outs["e_out"],
        rtol=1e-3, atol=1e-4,
    )


def _regen():
    """Rebuild the frozen fixtures from the torch oracles (needs torch)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # before any backend use
    import torch

    sys.path.insert(0, str(Path(__file__).parent))
    from test_classifiers import TMobileNetV2, TResNet18
    from test_convert_parity import TStylEx

    inp = fixed_inputs()
    spec, outs = {}, {}

    def load_synth(model, name):
        entries = [[k, list(v.shape)] for k, v in model.state_dict().items()]
        spec[name] = entries
        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in synth_state_dict(entries).items()}
        model.load_state_dict(sd)
        return model.eval()

    rnet = load_synth(TResNet18(), "resnet18")
    mnet = load_synth(TMobileNetV2(), "mobilenet_v2")
    x_t = torch.from_numpy(inp["clf_imgs"].transpose(0, 3, 1, 2))
    with torch.no_grad():
        outs["resnet_logits"] = rnet(x_t).numpy()
        outs["mobilenet_logits"] = mnet(x_t).numpy()

    stylex = load_synth(TStylEx(), "stylex")
    with torch.no_grad():
        outs["s_w"] = stylex.S(torch.from_numpy(inp["z"])).numpy()
        rgb, coords = stylex.G(
            torch.from_numpy(inp["w"]), torch.from_numpy(inp["inoise"])
        )
        outs["g_rgb"] = rgb.permute(0, 2, 3, 1).numpy()
        outs["g_coords"] = coords.numpy()
        xs = torch.from_numpy(inp["x"].transpose(0, 3, 1, 2))
        outs["d_out"] = stylex.D(xs).numpy()[:, 0]
        outs["e_out"] = stylex.encoder(xs).numpy()

    GOLDEN.mkdir(exist_ok=True)
    SPEC_PATH.write_text(json.dumps(spec))
    np.savez_compressed(OUT_PATH, **outs)
    print(f"wrote {SPEC_PATH} ({SPEC_PATH.stat().st_size} B) and "
          f"{OUT_PATH} ({OUT_PATH.stat().st_size} B)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        _regen()
    else:
        print(__doc__)
