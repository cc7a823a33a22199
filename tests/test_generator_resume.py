"""Block-resume generation must equal the full forward.

A StyleSpace perturbation at block k cannot affect blocks < k, so the
AttFind sweep caches each image's per-block entry state and re-runs only
blocks k..end (generator.py `__call__` start_block/initial_state). These
tests pin the invariant the optimization rests on: resuming from any
captured state reproduces the full forward bit-for-bit, with and without
a style_delta landing in the resumed block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylex_tpu.config import ModelConfig
from stylex_tpu.models import build_stylex, init_stylex_params
from stylex_tpu.models.generator import style_coord_dims
from stylex_tpu.ops import expand_styles, image_noise, latent_noise


def _setup(attn=(), no_const=False):
    cfg = ModelConfig(
        image_size=32,
        network_capacity=4,
        latent_dim=66,
        encoder_dim=64,
        attn_layers=tuple(attn),
        no_const=no_const,
    )
    m = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(0), m)
    z = latent_noise(jax.random.PRNGKey(1), 3, cfg.mapping_dim)
    ws = expand_styles(m.map_z(params, z), m.num_layers)
    noise = image_noise(jax.random.PRNGKey(2), 3, cfg.image_size)
    return cfg, m, params, ws, noise


@pytest.mark.parametrize("attn,no_const", [((), False), ((2,), False), ((), True)])
def test_resume_matches_full_forward(attn, no_const):
    cfg, m, params, ws, noise = _setup(attn, no_const)
    dims = style_coord_dims(cfg.image_size, cfg.network_capacity)
    # delta with a coordinate perturbed in EVERY block
    delta = jnp.zeros((3, m.total_style_coords))
    off = 0
    for i, o in dims:
        delta = delta.at[:, off + 1].set(2.5)
        off += i + o

    full, full_coords, states = m.generate(params, ws, noise, style_delta=delta,
                                           capture_states=True)
    assert len(states) == len(dims)
    for k in range(len(dims)):
        part, part_coords = m.generate(
            params, ws, noise, style_delta=delta,
            start_block=k, initial_state=states[k],
        )
        np.testing.assert_array_equal(np.asarray(part), np.asarray(full),
                                      err_msg=f"resume at block {k}")
        # coords of blocks >= k must match; earlier are zero-filled
        off = sum(i + o for i, o in dims[:k])
        np.testing.assert_array_equal(
            np.asarray(part_coords[:, off:]), np.asarray(full_coords[:, off:])
        )
        assert not np.any(np.asarray(part_coords[:, :off]))


def test_states_are_delta_invariant_upstream():
    """The state entering block k does not depend on deltas at blocks >= k,
    so states captured WITHOUT a delta are valid for any perturbation at
    block k — exactly how the sweep uses them."""
    cfg, m, params, ws, noise = _setup()
    dims = style_coord_dims(cfg.image_size, cfg.network_capacity)
    _, _, clean_states = m.generate(params, ws, noise, capture_states=True)

    # perturb a block-2 coordinate; resume from the CLEAN block-2 state
    off = sum(i + o for i, o in dims[:2])
    delta = jnp.zeros((3, m.total_style_coords)).at[:, off + 3].set(4.0)
    full, _ = m.generate(params, ws, noise, style_delta=delta)
    part, _ = m.generate(params, ws, noise, style_delta=delta,
                         start_block=2, initial_state=clean_states[2])
    np.testing.assert_array_equal(np.asarray(part), np.asarray(full))
