"""Golden regression fixtures: pinned outputs of the tiny generator /
discriminator / mapping with fixed seeds.

These catch unintended numeric drift of the core ops (the AttFind top-k
ranking is sensitive to tiny changes — SURVEY §7 "hard parts"). The golden
file is committed; regenerate deliberately with
``python tests/test_golden.py regen`` after an intentional change.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.config import ModelConfig
from stylex_tpu.models import build_stylex, init_stylex_params
from stylex_tpu.ops.latents import expand_styles, evaluate_in_chunks

GOLDEN = Path(__file__).parent / "golden" / "tiny_stylex_v1.npz"


def _compute():
    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    modules = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(1234), modules)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.mapping_dim))
    w = modules.map_z(params, z)
    ws = expand_styles(w, modules.num_layers)
    noise = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 1))
    rgb, coords = modules.generate(params, ws, noise)
    d = modules.discriminate(params, jnp.clip(rgb, 0, 1))
    return {
        "w": np.asarray(w),
        "rgb": np.asarray(rgb),
        "coords": np.asarray(coords),
        "d": np.asarray(d),
    }


def test_golden_outputs_stable():
    assert GOLDEN.exists(), "golden file missing — run `python tests/test_golden.py regen`"
    got = _compute()
    want = np.load(GOLDEN)
    for key in ("w", "rgb", "coords", "d"):
        np.testing.assert_allclose(
            got[key], want[key], rtol=5e-4, atol=5e-5,
            err_msg=f"golden drift in {key}",
        )


def test_evaluate_in_chunks_matches_full():
    f = lambda x: x * 2.0 + 1.0
    x = jnp.arange(10.0).reshape(10, 1)
    np.testing.assert_allclose(
        np.asarray(evaluate_in_chunks(3, f, x)), np.asarray(f(x))
    )


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        GOLDEN.parent.mkdir(exist_ok=True)
        np.savez(GOLDEN, **_compute())
        print(f"wrote {GOLDEN}")
