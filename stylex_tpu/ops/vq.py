"""Vector quantization (EMA codebook) for the discriminator's optional
``fq_layers``.

The reference wraps ``vector_quantize_pytorch.VectorQuantize`` in an
NHWC permute (`/root/reference/stylex/stylex_train.py:132-141,871`) — note
its ``DiscriminatorE.forward`` actually *drops* the quantize loss (single
return at `stylex_train.py:909`), and the new-arch trainer references
undefined ``fake_q_loss``/``real_q_loss`` (`stylex_train_new.py:1383`), so
the feature is broken there. Here the op is implemented with the standard
semantics (straight-through estimator, commitment loss, EMA codebook) and
the loss is propagated for real.

Functional state: the codebook and its EMA accumulators live in an explicit
:class:`VQState` pytree threaded through the call — no hidden mutation, so
the op jits/shards like everything else.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["VQState", "init_vq_state", "vector_quantize"]


class VQState(NamedTuple):
    codebook: jax.Array  # (n_codes, dim)
    cluster_size: jax.Array  # (n_codes,)
    embed_avg: jax.Array  # (n_codes, dim)


def init_vq_state(key: jax.Array, dim: int, n_codes: int, dtype=jnp.float32) -> VQState:
    codebook = jax.random.normal(key, (n_codes, dim), dtype)
    return VQState(codebook, jnp.zeros((n_codes,), dtype), codebook.copy())


def vector_quantize(
    state: VQState,
    x: jax.Array,
    *,
    decay: float = 0.8,
    commitment: float = 1.0,
    eps: float = 1e-5,
    update: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """Quantize features against the codebook.

    Args:
      x: (..., dim) features (NHWC maps pass (B, H, W, C)).
      update: apply the EMA codebook update (True in training).

    Returns:
      (quantized_with_straight_through, code_indices, commitment_loss,
      new_state).
    """
    flat = x.reshape(-1, x.shape[-1])
    # squared distances via the expanded form (MXU matmul + reductions)
    dots = flat @ state.codebook.T
    dist = (
        jnp.sum(jnp.square(flat), axis=1, keepdims=True)
        - 2.0 * dots
        + jnp.sum(jnp.square(state.codebook), axis=1)[None, :]
    )
    idx = jnp.argmin(dist, axis=1)
    onehot = jax.nn.one_hot(idx, state.codebook.shape[0], dtype=flat.dtype)
    quantized = (onehot @ state.codebook).reshape(x.shape)

    loss = commitment * jnp.mean(jnp.square(jax.lax.stop_gradient(quantized) - x))
    # straight-through: gradients flow to x, codebook learns via EMA
    quantized = x + jax.lax.stop_gradient(quantized - x)

    if update:
        counts = jnp.sum(onehot, axis=0)
        embed_sums = onehot.T @ jax.lax.stop_gradient(flat)
        cluster_size = state.cluster_size * decay + (1.0 - decay) * counts
        embed_avg = state.embed_avg * decay + (1.0 - decay) * embed_sums
        n = jnp.sum(cluster_size)
        smoothed = (cluster_size + eps) / (n + state.codebook.shape[0] * eps) * n
        codebook = embed_avg / smoothed[:, None]
        state = VQState(codebook, cluster_size, embed_avg)

    return quantized, idx.reshape(x.shape[:-1]), loss, state
