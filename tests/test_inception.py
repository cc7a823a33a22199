"""InceptionV3-FID structural tests: forward shape and converter mapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.models.inception import (
    InceptionV3FID,
    convert_inception_state_dict,
    init_inception_variables,
    pool3_features_fn,
)


@pytest.fixture(scope="module")
def variables():
    return init_inception_variables()


@pytest.mark.slow
def test_forward_shape(variables):
    feats = pool3_features_fn(variables, resize_to=75)(jnp.zeros((2, 32, 32, 3)))
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def _flax_to_torch_sd(variables):
    """Emit a torchvision-style state dict from the flax tree (test helper)."""
    sd = {}

    def walk(tree, path, collection):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + [k], collection)
            else:
                prefix = ".".join(path)
                arr = np.asarray(v)
                if k == "kernel":
                    sd[f"{prefix}.weight"] = arr.transpose(3, 2, 0, 1)
                elif k == "scale":
                    sd[f"{prefix}.weight"] = arr
                elif k == "bias":
                    sd[f"{prefix}.bias"] = arr
                elif k == "mean":
                    sd[f"{prefix}.running_mean"] = arr
                elif k == "var":
                    sd[f"{prefix}.running_var"] = arr

    walk(jax.tree.map(np.asarray, variables["params"]), [], "params")
    walk(jax.tree.map(np.asarray, variables["batch_stats"]), [], "batch_stats")
    return sd


@pytest.mark.slow
def test_converter_roundtrip(variables):
    sd = _flax_to_torch_sd(variables)
    sd["fc.weight"] = np.zeros((1000, 2048))  # must be ignored
    back = convert_inception_state_dict(sd)

    leaves_a, treedef_a = jax.tree_util.tree_flatten(variables["params"])
    leaves_b, treedef_b = jax.tree_util.tree_flatten(back["params"])
    assert treedef_a == treedef_b, "converted params tree differs from flax init tree"
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    leaves_a, treedef_a = jax.tree_util.tree_flatten(variables["batch_stats"])
    leaves_b, treedef_b = jax.tree_util.tree_flatten(back["batch_stats"])
    assert treedef_a == treedef_b
