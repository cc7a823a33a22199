"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylex_tpu.ops.blur import blur3
from stylex_tpu.ops.pallas_blur import blur3_downsample2x_pallas, blur3_pallas


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 16, 16, 130), (3, 32, 8, 8)])
def test_blur3_pallas_matches_xla(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    want = np.asarray(blur3(x))
    got = np.asarray(blur3_pallas(x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 8, 8, 4), (1, 16, 16, 130)])
def test_blur3_downsample_pallas_matches_xla(shape):
    x = jnp.asarray(np.random.RandomState(1).randn(*shape).astype(np.float32))
    want = np.asarray(blur3(x))[:, ::2, ::2, :]
    got = np.asarray(blur3_downsample2x_pallas(x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 4, 4, 128), (1, 8, 8, 130), (2, 8, 12, 16)])
def test_upsample2x_pallas_matches_resize(shape):
    from stylex_tpu.ops.blur import upsample2x_bilinear
    from stylex_tpu.ops.pallas_upsample import upsample2x_bilinear_pallas

    x = jnp.asarray(np.random.RandomState(2).randn(*shape).astype(np.float32))
    want = np.asarray(upsample2x_bilinear(x))
    got = np.asarray(upsample2x_bilinear_pallas(x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(6, 4, 4, 128), (3, 8, 8, 130)])
def test_upsample2x_pallas_batched_matches_resize(shape):
    from stylex_tpu.ops.blur import upsample2x_bilinear
    from stylex_tpu.ops.pallas_upsample import upsample2x_bilinear_pallas_batched

    x = jnp.asarray(np.random.RandomState(3).randn(*shape).astype(np.float32))
    want = np.asarray(upsample2x_bilinear(x))
    got = np.asarray(upsample2x_bilinear_pallas_batched(x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample2x_custom_vjp_matches_xla_grad():
    """upsample2x_bilinear carries a custom_vjp (its TPU forward may be the
    Pallas kernel); the backward must equal the XLA resize vjp exactly."""
    import jax
    import jax.numpy as jnp

    from stylex_tpu.ops.blur import upsample2x_bilinear, upsample2x_bilinear_xla

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)

    def loss(f):
        return lambda v: jnp.sum(jnp.sin(f(v)) ** 2)

    g1 = jax.grad(loss(upsample2x_bilinear))(x)
    g2 = jax.grad(loss(upsample2x_bilinear_xla))(x)
    assert jnp.allclose(g1, g2, atol=1e-6)
