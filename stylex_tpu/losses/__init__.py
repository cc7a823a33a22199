"""Loss library — every StylEx training objective as a pure function.

References (all `/root/reference/stylex/stylex_train.py` unless noted):

* hinge D/G losses (`:382-387`) — note the reference's sign convention:
  D pushes real scores negative / fake positive, G minimises ``fake.mean()``;
  kept as-is so discriminator thresholds (AttFind's ``-0.5``) transfer.
* dual contrastive loss (`:390-400`),
* reconstruction = 0.1*LPIPS + 0.1*L1(E(x̂), E(x)) + L1(x̂, x) (`:409-418`),
* classifier KL with ``log_target`` semantics and batchmean reduction
  (`:404-406,421-438`),
* gradient penalty: 10 * (||∂D/∂x||₂ - 1)² on real images (`:296-303`),
* path-length regulariser (`:306-316,1422-1429`).

The gradient-based penalties take the scoring/generating function itself so
they can be expressed with ``jax.grad`` inside the jitted train step — no
autograd-graph juggling (``create_graph``/``retain_graph``) exists here.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from stylex_tpu.models.lpips import lpips_distance
from stylex_tpu.ops.latents import lpips_normalize

__all__ = [
    "d_hinge_loss",
    "g_hinge_loss",
    "dual_contrastive_loss",
    "reconstruction_loss",
    "classifier_kl_loss",
    "gradient_penalty",
    "path_length_penalty",
]


def d_hinge_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """``mean(relu(1 + real) + relu(1 - fake))`` (`hinge_loss`, `:386-387`)."""
    return jnp.mean(jax.nn.relu(1.0 + real_scores) + jax.nn.relu(1.0 - fake_scores))


def g_hinge_loss(fake_scores: jax.Array) -> jax.Array:
    """``fake.mean()`` (`gen_hinge_loss`, `:382-383`)."""
    return jnp.mean(fake_scores)


def dual_contrastive_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
    """Bidirectional contrastive D loss (`dual_contrastive_loss`, `:390-400`)."""

    def loss_half(t1, t2):
        t1 = t1.reshape(-1, 1)
        t2 = jnp.broadcast_to(t2.reshape(1, -1), (t1.shape[0], t2.size))
        logits = jnp.concatenate([t1, t2], axis=-1)
        # cross-entropy with target index 0
        return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[:, 0])

    return loss_half(real_scores, fake_scores) + loss_half(-fake_scores, -real_scores)


def reconstruction_loss(
    lpips_params: Dict,
    encoder_batch: jax.Array,
    generated_images: jax.Array,
    generated_images_w: jax.Array,
    encoder_w: jax.Array,
) -> jax.Array:
    """StylEx reconstruction loss (`reconstruction_loss`, `:409-418`)."""
    percep = lpips_distance(
        lpips_params, lpips_normalize(encoder_batch), lpips_normalize(generated_images)
    ).mean()
    w_l1 = jnp.mean(jnp.abs(encoder_w - generated_images_w))
    img_l1 = jnp.mean(jnp.abs(encoder_batch - generated_images))
    return 0.1 * percep + 0.1 * w_l1 + 1.0 * img_l1


def classifier_kl_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """KL(p_real || p_fake), batchmean (`classifier_kl_loss`, `:421-438`:
    ``KLDivLoss(reduction='batchmean', log_target=True)(log p_fake,
    log p_real)``)."""
    log_p_real = jax.nn.log_softmax(real_logits, axis=-1)
    log_p_fake = jax.nn.log_softmax(fake_logits, axis=-1)
    p_real = jnp.exp(log_p_real)
    return jnp.sum(p_real * (log_p_real - log_p_fake)) / real_logits.shape[0]


def gradient_penalty(
    score_fn: Callable[[jax.Array], jax.Array], images: jax.Array, weight: float = 10.0
) -> jax.Array:
    """``weight * mean((||∂ sum(score)/∂ images||₂ - 1)²)``
    (`gradient_penalty`, `:296-303`), with ``jax.grad`` replacing
    ``torch.autograd.grad(create_graph=True)``."""
    grads = jax.grad(lambda x: jnp.sum(score_fn(x)))(images)
    norms = jnp.linalg.norm(grads.reshape(images.shape[0], -1), axis=1)
    return weight * jnp.mean(jnp.square(norms - 1.0))


def path_length_penalty(
    generate_fn: Callable[[jax.Array], jax.Array],
    w_styles: jax.Array,
    noise_key: jax.Array,
    pl_mean: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Path-length regularisation (`calc_pl_lengths`, `:306-316`; applied at
    `:1422-1429`).

    Args:
      generate_fn: w_styles -> images.
      w_styles: (B, num_layers, latent).
      noise_key: key for the unit-variance-per-image projection noise.
      pl_mean: running mean of path lengths (EMA 0.99 outside).

    Returns:
      (penalty, batch_mean_path_length).
    """

    def proj(w):
        images = generate_fn(w)
        num_pixels = images.shape[1] * images.shape[2]
        pl_noise = jax.random.normal(noise_key, images.shape, images.dtype) / jnp.sqrt(
            jnp.asarray(num_pixels, images.dtype)
        )
        return jnp.sum(images * pl_noise)

    pl_grads = jax.grad(proj)(w_styles)
    # (B, L, D): sum over latent dim, mean over layers, sqrt  (`:316`)
    lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1))
    penalty = jnp.mean(jnp.square(lengths - pl_mean))
    return penalty, jnp.mean(lengths)
