"""Weights-ingestion round trips: torch .pt -> ingest -> .msgpack -> loader.

Covers VERDICT r1 "Next #8": every pretrained net (classifier, LPIPS-alex,
InceptionV3) has a one-command ingestion path whose cached msgpack loads
bit-identically to the direct torch conversion, and explicitly requested
weights that are missing fail loudly instead of silently falling back to
random init.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


def _trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lpips_ingest_roundtrip(tmp_path):
    from stylex_tpu.ingest import ingest_lpips
    from stylex_tpu.models.lpips import (
        LPIPS_CFG,
        convert_lpips_state_dict,
        load_lpips_params,
        lpips_distance,
    )

    # synthesize a torch-layout lpips(net='alex') state dict
    torch.manual_seed(0)
    sd = {}
    slice_sizes = [2, 3, 3, 3, 2]  # conv indices per lpips slice
    idx = 0
    in_ch = 3
    conv_positions = [0, 3, 6, 8, 10]  # torchvision alexnet feature indices
    for i, (out_ch, k, _, _) in enumerate(LPIPS_CFG):
        sd[f"net.features.{conv_positions[i]}.weight"] = torch.randn(out_ch, in_ch, k, k)
        sd[f"net.features.{conv_positions[i]}.bias"] = torch.randn(out_ch)
        sd[f"lin{i}.model.1.weight"] = torch.rand(1, out_ch, 1, 1)
        in_ch = out_ch
    src = tmp_path / "lpips_alex.pt"
    torch.save(sd, src)

    out = tmp_path / "lpips_alex.msgpack"
    ingest_lpips(str(src), str(out))
    direct = convert_lpips_state_dict(sd)
    cached = load_lpips_params(str(out))
    _trees_equal(direct, cached)

    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(lpips_distance(cached, x, y)),
        np.asarray(lpips_distance(direct, x, y)),
        rtol=1e-6,
    )


def test_lpips_package_slice_layout():
    """The real ``lpips.LPIPS(net='alex')`` state dict wraps AlexNet in
    slice1..slice5 Sequentials that KEEP the original torchvision feature
    indices as module names (lpips/pretrained_networks.py ``alexnet``), so
    keys look like ``net.slice2.3.weight`` — not ``net.features.3.weight``.
    The converter must map both layouts to identical params."""
    from stylex_tpu.models.lpips import LPIPS_CFG, convert_lpips_state_dict

    torch.manual_seed(1)
    conv_positions = [0, 3, 6, 8, 10]  # torchvision alexnet feature indices
    tv_sd, lp_sd = {}, {}
    # slice s (1-based) holds features[prev:pos+1]; conv index keeps its
    # original name inside the slice.
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(LPIPS_CFG):
        w = torch.randn(out_ch, in_ch, k, k)
        b = torch.randn(out_ch)
        lin = torch.rand(1, out_ch, 1, 1)
        pos = conv_positions[i]
        tv_sd[f"net.features.{pos}.weight"] = w
        tv_sd[f"net.features.{pos}.bias"] = b
        tv_sd[f"lin{i}.model.1.weight"] = lin
        lp_sd[f"net.slice{i + 1}.{pos}.weight"] = w
        lp_sd[f"net.slice{i + 1}.{pos}.bias"] = b
        lp_sd[f"lin{i}.model.1.weight"] = lin
        in_ch = out_ch
    # full-module dicts also carry the scaling layer buffers; must be ignored
    lp_sd["scaling_layer.shift"] = torch.randn(1, 3, 1, 1)
    lp_sd["scaling_layer.scale"] = torch.randn(1, 3, 1, 1)

    _trees_equal(convert_lpips_state_dict(tv_sd), convert_lpips_state_dict(lp_sd))


def test_lpips_taps_only_fails_loudly():
    """The official standalone ``alex.pth`` ships only the lin calibration
    taps (no AlexNet backbone); converting it must raise a clear error, not
    an IndexError or a silent random backbone."""
    from stylex_tpu.models.lpips import LPIPS_CFG, convert_lpips_state_dict

    sd = {
        f"lin{i}.model.1.weight": torch.rand(1, out_ch, 1, 1)
        for i, (out_ch, *_rest) in enumerate(LPIPS_CFG)
    }
    with pytest.raises(ValueError, match="taps-only"):
        convert_lpips_state_dict(sd)


def test_lpips_missing_file_fails_loudly(tmp_path):
    from stylex_tpu.models.lpips import load_lpips_params

    with pytest.raises(FileNotFoundError):
        load_lpips_params(str(tmp_path / "nope.msgpack"))


def test_classifier_ingest_roundtrip(tmp_path):
    from tests.test_convert_parity import IMAGE_SIZE  # noqa: F401  (env setup)
    from stylex_tpu.ingest import _save_msgpack
    from stylex_tpu.models.classifiers import build_classifier

    clf = build_classifier("mobilenet", 32, num_classes=2, rng=jax.random.PRNGKey(3))
    out = tmp_path / "clf.msgpack"
    _save_msgpack(clf.variables, str(out))
    clf2 = build_classifier("mobilenet", 32, num_classes=2, checkpoint_path=str(out))
    _trees_equal(clf.variables, clf2.variables)
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(clf2.classify_images(x)), np.asarray(clf.classify_images(x)), rtol=1e-6
    )


@pytest.mark.slow
def test_inception_ingest_roundtrip(tmp_path, monkeypatch):
    from stylex_tpu.ingest import _save_msgpack
    from stylex_tpu.models.inception import (
        default_pool3_features,
        init_inception_variables,
        load_inception_variables,
        pool3_features_fn,
    )

    variables = init_inception_variables(jax.random.PRNGKey(0))
    out = tmp_path / "inception.msgpack"
    _save_msgpack(variables, str(out))
    restored = load_inception_variables(str(out))
    _trees_equal(variables, restored)

    # env-var path: set but missing -> loud failure, never silent fallback
    monkeypatch.setenv("STYLEX_TPU_INCEPTION", str(tmp_path / "missing.msgpack"))
    with pytest.raises(FileNotFoundError):
        default_pool3_features()
    monkeypatch.delenv("STYLEX_TPU_INCEPTION")
    assert default_pool3_features() is None

    x = jnp.asarray(np.random.RandomState(1).rand(1, 75, 75, 3), jnp.float32)
    f_direct = pool3_features_fn(variables)(x)
    f_cached = pool3_features_fn(restored)(x)
    np.testing.assert_allclose(np.asarray(f_cached), np.asarray(f_direct), rtol=1e-5, atol=1e-5)
