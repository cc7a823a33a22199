"""The jitted StylEx train step — the whole of `Trainer.train()` as one XLA
program.

The reference's step (`/root/reference/stylex/stylex_train.py:1249-1506`,
new-arch `stylex_train_new.py:1301-1545`) is a Python loop of micro-batches
with per-iteration host RNG, in-place optimizers and three separate
backward passes. Here the whole step is one ``jit``:

* gradient accumulation is a ``lax.scan`` over stacked micro-batches — the
  alternating encoder/prior schedule (`:1299-1328`) becomes a static
  ``is_enc`` pattern consumed by ``lax.cond`` (both branches compile once,
  only one executes per iteration),
* gradient penalty (every 4 steps) and path-length penalty (every 32 after
  5k) are ``lax.cond`` on traced step flags — no recompilation, no wasted
  FLOPs on off-steps (`:1272-1273`),
* one loss, one ``jax.grad`` per phase — XLA fuses what the reference ran
  as three ``backward(retain_graph=True)`` passes (`:1434-1438`),
* EMA update/reset run on-device inside the step (`:1475-1479`),
* data parallelism: batches are sharded over the mesh 'data' axis by the
  caller; since the step is a global-view SPMD program, gradient reduction
  is an XLA all-reduce over ICI — the DDP/no_sync machinery
  (`:274-285,1188-1193`) has no equivalent because it isn't needed.

Faithful semantics notes:

* hinge sign convention preserved (D: real→negative) so the AttFind
  discriminator threshold transfers,
* rec/kl are scaled 2x under alternating training (OLD: inline ``2 *``,
  `:1411-1416`; NEW doubles the scalings once, `stylex_train_new.py:1166-
  1170`),
* ``kl_rec_during_disc`` (NEW-arch option, `stylex_train_new.py:1392-1411`)
  is implemented with the author's evident intent: rec/KL gradients computed
  during the D phase are *folded into the G-phase update*. (In the reference
  these gradients are erased by ``G_opt.zero_grad()`` before ``G_opt.step()``
  — the flag is a silent no-op there.)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from stylex_tpu.config import Arch, ModelConfig, TrainConfig
from stylex_tpu.losses import (
    classifier_kl_loss,
    d_hinge_loss,
    dual_contrastive_loss,
    g_hinge_loss,
    gradient_penalty,
    path_length_penalty,
    reconstruction_loss,
)
from stylex_tpu.models.stylex import StylExModules, ema_update, make_w, prior_w
from stylex_tpu.ops.diffaug import augment_for_discriminator
from stylex_tpu.ops.latents import expand_styles, image_noise, mixed_w_styles
from stylex_tpu.train.state import StylExTrainState

__all__ = ["make_train_step", "make_multi_train_step", "microbatch_schedule"]

Params = Dict[str, Any]


def microbatch_schedule(accum: int, alternating: bool) -> jnp.ndarray:
    """The encoder-input flag per micro-batch.

    The reference toggles a Python bool starting at False — so micro-batches
    0, 2, 4, ... use the prior path and 1, 3, 5, ... the encoder path
    (`stylex_train.py:1298-1328,1454`); without alternating training every
    micro-batch is encoder-input."""
    if not alternating:
        return jnp.ones((accum,), bool)
    return jnp.arange(accum) % 2 == 1


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_zeros_like(t):
    return jax.tree.map(jnp.zeros_like, t)


def make_multi_train_step(train_step):
    """K train steps as ONE dispatch: ``lax.scan`` of the single step over
    stacked batches and per-step keys.

    On a relayed/remote TPU each dispatch costs a host round-trip that can
    dwarf the 73 ms device step (measured ~0.4 s/step wall in the r2 64px
    campaign); scanning K steps inside one XLA program amortises that
    overhead K-fold. The reference has no equivalent — its host loop is one
    optimizer step per Python iteration by construction
    (`/root/reference/stylex/cli.py:71-76`).

    Semantics: the caller pre-splits the K step keys with the same
    ``jax.random.split`` chain the sequential host loop uses, so a K-step
    dispatch consumes identical randomness to K sequential dispatches; the
    trainer sizes K so that save/evaluate/FID boundary steps only ever land
    on the *last* step of a block (periodic host work stays exact).

    Args:
      train_step: the function built by :func:`make_train_step`.

    Returns ``multi_step(state, batch, keys) -> (state, metrics)`` where
    every ``batch`` leaf is stacked to ``(K, ...)`` over its single-step
    shape, ``keys`` is ``(K,)`` PRNG keys, and each metric comes back
    stacked ``(K,)`` (step-ordered).
    """

    def multi_step(state: StylExTrainState, batch: Dict[str, jax.Array], keys: jax.Array):
        def body(st, xs):
            b, key = xs
            return train_step(st, b, key)

        return lax.scan(body, state, (batch, keys))

    return multi_step


def make_train_step(
    modules: StylExModules,
    classifier_fn: Callable[[jax.Array], jax.Array],
    lpips_params: Params,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    g_tx,
    d_tx,
):
    """Build the jitted train step.

    Returns ``step(state, batch, rng) -> (state, metrics)`` where ``batch``
    holds stacked micro-batches:

    * ``d_real``: (accum, B, S, S, C) — D-phase real images,
    * ``d_enc``:  (accum, B, S, S, C) — D-phase encoder/conditioning images,
    * ``g_imgs``: (accum, B, S, S, C) — G-phase images,
    * ``g_real`` (only when ``dual_contrast_loss``): (accum, B, S, S, C).
    """
    cfg = model_cfg
    tc = train_cfg
    accum = tc.gradient_accumulate_every
    L = modules.num_layers
    B_noise_size = cfg.image_size
    is_enc_flags = microbatch_schedule(accum, tc.alternating_training)
    compute_dtype = jnp.bfloat16 if tc.compute_dtype == "bfloat16" else jnp.float32

    # rec/kl scaling: OLD always doubles inline; NEW doubles iff alternating.
    double = 2.0 if (cfg.arch == Arch.OLD or tc.alternating_training) else 1.0
    eff_rec = double * tc.rec_scaling
    eff_kl = double * tc.kl_scaling

    aug_prob = tc.aug_prob if tc.aug_prob is not None else 0.0
    aug_types = tuple(tc.aug_types)

    if tc.dual_contrast_loss:
        d_loss_fn_ = dual_contrastive_loss
        g_needs_reals = True
    else:
        d_loss_fn_ = d_hinge_loss
        g_needs_reals = False

    def cast(x):
        return x.astype(compute_dtype) if compute_dtype != jnp.float32 else x

    if compute_dtype != jnp.float32:
        # Mixed precision, TPU-native (replaces apex O1, `stylex_train.py:
        # 968-972`): fp32 master params, bf16 forward compute. Casting sits
        # inside the loss closures so cotangents flow back to fp32 grads;
        # the frozen classifier keeps fp32 weights (bf16 activations promote
        # up), preserving KL-logit fidelity.
        def cast_tree(t):
            return jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                t,
            )
    else:
        cast_tree = lambda t: t

    # ---------------------------------------------------------------- utils
    def sample_prior_w(params: Params, key: jax.Array, batch: int, probs: jax.Array):
        """Style-mixed prior w tensor (`mixed_list`/`noise_list`/`latent_to_w`,
        `stylex_train.py:319-336`)."""
        kz1, kz2, kmix, kcut = jax.random.split(key, 4)
        z1 = jax.random.normal(kz1, (batch, cfg.mapping_dim))
        z2 = jax.random.normal(kz2, (batch, cfg.mapping_dim))
        w1 = modules.map_z(params, z1)
        w2 = modules.map_z(params, z2)
        mixed = jax.random.bernoulli(kmix, tc.mixed_prob)
        cutoff = jnp.where(mixed, jax.random.randint(kcut, (), 0, L), L)
        w_styles = mixed_w_styles(w1, w2, cutoff, L)
        if cfg.arch == Arch.NEW:
            pb = jnp.broadcast_to(probs[:, None, :], (batch, L, cfg.num_classes))
            w_styles = jnp.concatenate([w_styles, pb], axis=-1)
        return w_styles

    def encoder_w(params: Params, images: jax.Array, logits: jax.Array):
        enc = modules.encode(params, images)
        return expand_styles(make_w(cfg, enc, logits), L), enc

    def d_score(params: Params, images: jax.Array, probs, key: jax.Array):
        aug = augment_for_discriminator(key, images, aug_prob, aug_types)
        return modules.discriminate(params, aug, probs)

    # ------------------------------------------------------------- D phase
    def d_phase(params: Params, rng: jax.Array, d_real, d_enc, apply_gp, apply_cl_gen):
        def micro(carry, xs):
            d_grads, gside_grads, div_acc, gp_acc, q_acc, cr_acc, rng = carry
            real_img, enc_img, is_enc = xs
            rng, k_prior, k_noise, k_augf, k_augr, k_cl_r, k_cl_f = jax.random.split(rng, 7)
            batch = real_img.shape[0]

            if cfg.arch == Arch.NEW:
                enc_logits = classifier_fn(enc_img)
                probs = jax.nn.softmax(enc_logits, axis=-1)
            else:
                probs = None

            def enc_branch(_):
                if cfg.arch == Arch.NEW:
                    logits = enc_logits
                else:
                    logits = classifier_fn(enc_img)
                w, _ = encoder_w(params, enc_img, logits)
                return w

            def prior_branch(_):
                return sample_prior_w(params, k_prior, batch, probs)

            w_styles = lax.cond(is_enc, enc_branch, prior_branch, None)
            noise = image_noise(k_noise, batch, B_noise_size)
            fake, _ = modules.generate(cast_tree(params), cast(w_styles), cast(noise))
            fake = lax.stop_gradient(fake)

            def d_loss(dp):
                p = {**cast_tree(params), "D": cast_tree(dp)}
                # ONE batched trunk pass over [aug(fake); aug(real)]:
                # per-sample math identical to two B-sized passes (the
                # reference's two `D_aug` calls, `stylex_train.py:1331-1340`)
                # but half the kernel launches at 2x batch utilization —
                # micro-batches are tiny (default 4) so the trunk is
                # dispatch/utilization-bound on TPU.
                aug_f = augment_for_discriminator(k_augf, cast(fake), aug_prob, aug_types)
                aug_r = augment_for_discriminator(
                    k_augr, cast(real_img), aug_prob, aug_types
                )
                both = jnp.concatenate([aug_f, aug_r], axis=0)
                probs2 = (
                    jnp.concatenate([probs, probs], axis=0)
                    if probs is not None
                    else None
                )
                q_loss = jnp.zeros(())
                if cfg.fq_layers:
                    # feature-quantization commitment losses
                    # (`stylex_train_new.py:1381-1385` intent; dropped
                    # there), sown by the SAME batched trunk pass that
                    # scores [aug(fake); aug(real)] — no extra D forwards.
                    # vector_quantize means over the combined 2B batch, so
                    # 2x restores the separate fake-pass + real-pass sum.
                    variables = {"params": p["D"], "vq": p["D_vq"]}
                    args = (both, probs2) if cfg.arch == Arch.NEW else (both,)
                    scores, inter = modules.D.apply(
                        variables, *args, mutable=["intermediates"]
                    )
                    scores = scores.astype(jnp.float32)
                    q_loss = 2.0 * sum(
                        jnp.sum(v) for v in jax.tree.leaves(inter["intermediates"])
                    )
                else:
                    scores = modules.discriminate(p, both, probs2).astype(jnp.float32)
                fake_scores, real_scores = scores[:batch], scores[batch:]
                real_fn = lambda im: d_score(p, cast(im), probs, k_augr).astype(jnp.float32)
                r, f = real_scores, fake_scores
                if tc.rel_disc_loss:
                    r = real_scores - jnp.mean(fake_scores)
                    f = fake_scores - jnp.mean(real_scores)
                div = d_loss_fn_(r, f)
                gp = lax.cond(
                    apply_gp,
                    lambda: gradient_penalty(real_fn, real_img),
                    lambda: jnp.zeros((), div.dtype),
                )
                q_loss = q_loss.astype(div.dtype)
                cr_loss = jnp.zeros((), div.dtype)
                if tc.cl_reg:
                    # SimCLR regularisation on D trunk features; generated
                    # images join after 20k steps (`stylex_train.py:1274`).
                    # Real and generated views use independent keys so their
                    # augmentations are uncorrelated.
                    from stylex_tpu.losses.contrastive import contrastive_d_loss

                    feats_vars = {"params": p["D"]}
                    if "D_vq" in p:  # quantize layers read the vq collection
                        feats_vars["vq"] = p["D_vq"]
                    feats = lambda im: modules.D.apply(
                        feats_vars, im, return_features=True
                    )
                    cl = contrastive_d_loss(feats, k_cl_r, real_img)
                    cl_gen = lax.cond(
                        apply_cl_gen,
                        lambda: contrastive_d_loss(feats, k_cl_f, fake),
                        lambda: jnp.zeros(()),
                    )
                    cr_loss = (cl + cl_gen).astype(div.dtype)
                return (div + gp + q_loss + cr_loss) / accum, (div, gp, q_loss, cr_loss)

            (_, (div, gp, q_l, cr_l)), grads = jax.value_and_grad(d_loss, has_aux=True)(
                params["D"]
            )
            d_grads = _tree_add(d_grads, grads)

            # Optional rec/KL during the D phase (NEW arch, encoder
            # micro-batches) — folded into the G-phase update (see module
            # docstring).
            if tc.kl_rec_during_disc and cfg.arch == Arch.NEW:
                def aux_loss(gp_):
                    p = {**params, **gp_}
                    w, enc_out = encoder_w(p, enc_img, enc_logits)
                    fake2, _ = modules.generate(p, w, noise)
                    fake2_w = modules.encode(p, fake2)
                    rec = tc.rec_scaling * reconstruction_loss(
                        lpips_params, enc_img, fake2, fake2_w, enc_out
                    ) / accum
                    kl = tc.kl_scaling * classifier_kl_loss(enc_logits, classifier_fn(fake2)) / accum
                    return rec + kl

                gsub = {k: params[k] for k in ("encoder", "S", "G")}
                # cond, not where-on-grads: prior micro-batches (half of the
                # alternating schedule) skip the whole aux forward+backward
                aux_grads = lax.cond(
                    is_enc,
                    lambda: jax.grad(aux_loss)(gsub),
                    lambda: jax.tree.map(jnp.zeros_like, gsub),
                )
                gside_grads = _tree_add(gside_grads, aux_grads)

            return (
                d_grads,
                gside_grads,
                div_acc + div / accum,
                gp_acc + gp / accum,
                q_acc + q_l.astype(jnp.float32) / accum,
                cr_acc + cr_l.astype(jnp.float32) / accum,
                rng,
            ), None

        gside0 = _tree_zeros_like({k: params[k] for k in ("encoder", "S", "G")})
        init = (
            _tree_zeros_like(params["D"]),
            gside0,
            jnp.zeros(()),
            jnp.zeros(()),
            jnp.zeros(()),
            jnp.zeros(()),
            rng,
        )
        (d_grads, gside_grads, div, gp, q_l, cr_l, rng), _ = lax.scan(
            micro, init, (d_real, d_enc, is_enc_flags)
        )
        return d_grads, gside_grads, div, gp, q_l, cr_l, rng

    # ------------------------------------------------------------- G phase
    def g_phase(params: Params, rng, g_imgs, g_real, apply_pl, pl_mean, top_k, gside_init):
        gsub_keys = ("encoder", "S", "G")

        def micro(carry, xs):
            g_grads, gl_acc, rec_acc, kl_acc, pl_last, rng = carry
            img, real_img, is_enc = xs
            rng, k_prior, k_noise, k_aug, k_augr, k_pl = jax.random.split(rng, 6)
            batch = img.shape[0]

            def g_loss(gp_):
                p = {**cast_tree(params), **cast_tree(gp_)}
                logits_real = classifier_fn(img).astype(jnp.float32)
                probs = jax.nn.softmax(logits_real, axis=-1) if cfg.arch == Arch.NEW else None

                def enc_branch(_):
                    w, enc_out = encoder_w(p, img, logits_real)
                    return w, enc_out

                def prior_branch(_):
                    w = sample_prior_w(p, k_prior, batch, probs)
                    return w, jnp.zeros((batch, cfg.encoder_dim), w.dtype)

                w_styles, enc_out = lax.cond(is_enc, enc_branch, prior_branch, None)
                noise = image_noise(k_noise, batch, B_noise_size)
                fake, _ = modules.generate(p, cast(w_styles), cast(noise))
                fake_logits = classifier_fn(fake).astype(jnp.float32)
                fake_scores = d_score(p, cast(fake), probs, k_aug).astype(jnp.float32)

                if g_needs_reals:
                    real_scores = lax.stop_gradient(
                        d_score(p, cast(real_img), probs, k_augr)
                    )
                    # top-k filtering not combined with dual-contrast in the
                    # reference either; keep full batch.
                    gen = dual_contrastive_loss(fake_scores, real_scores)
                else:
                    # generator top-k: keep the k smallest scores
                    # (`stylex_train.py:1399-1405`).
                    sorted_scores = jnp.sort(fake_scores)
                    mask = (jnp.arange(batch) < top_k).astype(sorted_scores.dtype)
                    gen = jnp.sum(sorted_scores * mask) / jnp.maximum(top_k, 1).astype(
                        sorted_scores.dtype
                    )

                def pl_branch():
                    gen_fn = lambda w: modules.generate(p, w, noise)[0]
                    pen, mean_len = path_length_penalty(gen_fn, w_styles, k_pl, pl_mean)
                    pen = jnp.where(pl_mean >= 0, pen, 0.0)
                    return pen, mean_len

                pl_pen, pl_len = lax.cond(
                    apply_pl, pl_branch, lambda: (jnp.zeros(()), jnp.zeros(()))
                )

                def rec_kl_branch(_):
                    fake_w = modules.encode(p, fake)
                    rec = eff_rec * reconstruction_loss(
                        lpips_params, img, fake, fake_w, enc_out
                    ) / accum
                    kl = eff_kl * classifier_kl_loss(logits_real, fake_logits) / accum
                    return rec, kl

                rec, kl = lax.cond(
                    is_enc, rec_kl_branch, lambda _: (jnp.zeros(()), jnp.zeros(())), None
                )
                total = (gen + pl_pen) / accum + rec + kl
                return total, (gen, rec, kl, pl_len)

            gsub = {k: params[k] for k in gsub_keys}
            (_, (gen, rec, kl, pl_len)), grads = jax.value_and_grad(g_loss, has_aux=True)(gsub)
            g_grads = _tree_add(g_grads, grads)
            pl_last = jnp.where(apply_pl, pl_len, pl_last)
            return (g_grads, gl_acc + gen / accum, rec_acc + rec, kl_acc + kl, pl_last, rng), None

        init = (gside_init, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), rng)
        (g_grads, gl, rec, kl, pl_last, rng), _ = lax.scan(
            micro, init, (g_imgs, g_real, is_enc_flags)
        )
        return g_grads, gl, rec, kl, pl_last, rng

    # -------------------------------------------------- fused (wide) phases
    # The scan phases above run `accum` micro-batch passes at batch B — the
    # literal shape of the reference's accumulation loop
    # (`stylex_train.py:1297-1360`). At the reference's B=4 that leaves the
    # MXU utilization-bound (docs/ROOFLINE.md: batch-32 isolation measured
    # 1.9x). The wide phases below compute the SAME step as one batched
    # forward/backward over accum*B samples:
    #
    # * the per-micro-batch RNG chain is replayed exactly (same
    #   jax.random.split sequence, so every z draw / noise map / DiffAugment
    #   decision is bit-identical),
    # * per-micro-batch semantics are preserved by keeping the (accum, B)
    #   structure wherever the math couples samples within a micro-batch:
    #   top-k sorts, relativistic means, dual-contrastive softmaxes, SimCLR
    #   negatives, per-micro-batch style-mixing cutoffs (vmapped),
    # * sums of per-micro-batch means become means over equal-sized groups,
    #   so losses/grads match the scan up to float reassociation
    #   (tests/test_train.py::test_fused_microbatches_match_scan).
    #
    # Multi-chip note: the (accum, B) -> (accum*B) flatten is B-MAJOR
    # (swapaxes then reshape), so with the batch sharded on B — the
    # trainer's layout — every device's rows stay contiguous and GSPMD
    # inserts NO collective. (The naive accum-major flatten interleaves
    # shards: observed as an all-gather of the full image batch, which on
    # the 8-virtual-device CPU mesh starved the collective rendezvous and
    # aborted the dryrun.)
    enc_flags_static = tuple(
        bool(x) for x in np.asarray(microbatch_schedule(accum, tc.alternating_training))
    )
    enc_idx = tuple(i for i, f in enumerate(enc_flags_static) if f)
    prior_idx = tuple(i for i, f in enumerate(enc_flags_static) if not f)

    def _key_chain(rng: jax.Array, n: int):
        """Replay the scan's per-micro-batch split chain: each iteration does
        ``rng, k1..k(n-1) = split(rng, n)``; returns (final rng, (accum, n-1)
        keys in schedule order)."""
        keys = []
        for _ in range(accum):
            parts = jax.random.split(rng, n)
            rng = parts[0]
            keys.append(parts[1:])
        return rng, jnp.stack(keys)

    def _flat(x):
        """(accum, B, ...) -> (accum*B, ...), B-major (sharding-contiguous)."""
        return jnp.swapaxes(x, 0, 1).reshape(
            (x.shape[0] * x.shape[1],) + x.shape[2:]
        )

    def _unflat(x, B):
        """Inverse of :func:`_flat`: (accum*B, ...) -> (accum, B, ...)."""
        return jnp.swapaxes(x.reshape((B, accum) + x.shape[1:]), 0, 1)

    def _take_mb(x, idx):
        """Gather micro-batches ``idx`` from an (accum, B, ...) array and
        flatten to (len(idx)*B, ...) in the same B-major order."""
        sub = jnp.stack([x[i] for i in idx])
        return jnp.swapaxes(sub, 0, 1).reshape(
            (len(idx) * x.shape[1],) + x.shape[2:]
        )

    def _assemble_w(params_like, k_prior, imgs_mb, logits_or_probs, B):
        """Per-micro-batch w tensors in schedule order: encoder micro-batches
        batched through E in one pass, prior micro-batches vmapped over their
        per-micro-batch keys (style-mixing cutoff is per micro-batch).
        Returns (w_all (accum,B,L,D), enc_out (n_enc*B, E) or None,
        enc_imgs flat or None, enc_logits flat or None)."""
        logits_all, probs_all = logits_or_probs
        w_parts = [None] * accum
        enc_out = enc_imgs = enc_logits = None
        if enc_idx:
            enc_imgs = _take_mb(imgs_mb, enc_idx)
            if logits_all is not None:
                enc_logits = _take_mb(logits_all, enc_idx)
            else:
                enc_logits = classifier_fn(enc_imgs)
            w_enc, enc_out = encoder_w(params_like, enc_imgs, enc_logits)
            # invert _take_mb's B-major flatten
            w_enc = jnp.swapaxes(
                w_enc.reshape((B, len(enc_idx)) + w_enc.shape[1:]), 0, 1
            )
            for j, i in enumerate(enc_idx):
                w_parts[i] = w_enc[j]
        if prior_idx:
            kp = jnp.stack([k_prior[i] for i in prior_idx])
            if cfg.arch == Arch.NEW:
                pp = jnp.stack([probs_all[i] for i in prior_idx])
                w_pri = jax.vmap(
                    lambda k, pr: sample_prior_w(params_like, k, B, pr)
                )(kp, pp)
            else:
                w_pri = jax.vmap(lambda k: sample_prior_w(params_like, k, B, None))(kp)
            for j, i in enumerate(prior_idx):
                w_parts[i] = w_pri[j]
        return jnp.stack(w_parts), enc_out, enc_imgs, enc_logits

    def d_phase_wide(params: Params, rng, d_real, d_enc, apply_gp, apply_cl_gen):
        rng, keys = _key_chain(rng, 7)
        k_prior, k_noise, k_augf, k_augr, k_cl_r, k_cl_f = (
            keys[:, j] for j in range(6)
        )
        B = d_real.shape[1]
        AB = accum * B
        flat = _flat
        unflat = lambda x: _unflat(x, B)

        if cfg.arch == Arch.NEW:
            logits_all = unflat(classifier_fn(flat(d_enc)))
            probs_all = jax.nn.softmax(logits_all, axis=-1)
            probs_flat = flat(probs_all)
        else:
            logits_all = probs_all = probs_flat = None

        w_all, _, enc_imgs, enc_logits = _assemble_w(
            params, k_prior, d_enc, (logits_all, probs_all), B
        )
        noise_all = jax.vmap(lambda k: image_noise(k, B, B_noise_size))(k_noise)
        fake, _ = modules.generate(
            cast_tree(params), cast(flat(w_all)), cast(flat(noise_all))
        )
        fake = lax.stop_gradient(fake)
        fake_mb = unflat(fake)

        vaug = jax.vmap(
            lambda k, im: augment_for_discriminator(k, im, aug_prob, aug_types)
        )

        def d_loss(dp):
            p = {**cast_tree(params), "D": cast_tree(dp)}
            aug_f = vaug(k_augf, cast(fake_mb))
            aug_r = vaug(k_augr, cast(d_real))
            both = jnp.concatenate([flat(aug_f), flat(aug_r)], axis=0)
            probs2 = (
                jnp.concatenate([probs_flat, probs_flat], axis=0)
                if probs_flat is not None
                else None
            )
            q_loss = jnp.zeros(())
            if cfg.fq_layers:
                variables = {"params": p["D"], "vq": p["D_vq"]}
                args = (both, probs2) if cfg.arch == Arch.NEW else (both,)
                scores, inter = modules.D.apply(
                    variables, *args, mutable=["intermediates"]
                )
                scores = scores.astype(jnp.float32)
                q_loss = 2.0 * sum(
                    jnp.sum(v) for v in jax.tree.leaves(inter["intermediates"])
                )
            else:
                scores = modules.discriminate(p, both, probs2).astype(jnp.float32)
            fake_scores = unflat(scores[:AB])
            real_scores = unflat(scores[AB:])
            r, f = real_scores, fake_scores
            if tc.rel_disc_loss:
                # per-micro-batch means, as in the sequential loop
                r = real_scores - jnp.mean(fake_scores, axis=1, keepdims=True)
                f = fake_scores - jnp.mean(real_scores, axis=1, keepdims=True)
            if tc.dual_contrast_loss:
                div = jnp.mean(jax.vmap(d_loss_fn_)(r, f))
            else:
                # hinge: mean over all == mean of per-micro-batch means
                div = d_loss_fn_(r, f)

            def gp_branch():
                # ONE batched R1 grad over all accum*B reals — per-sample
                # score sums decouple, so this equals the per-micro-batch
                # gradient_penalty means exactly; a vmap-of-grad would also
                # push rank-5 batches into the Pallas blur kernels, which
                # Mosaic cannot lower.
                def score_sum(imgs_mb):
                    aug = vaug(k_augr, cast(imgs_mb))
                    s = modules.discriminate(p, flat(aug), probs_flat)
                    return jnp.sum(s.astype(jnp.float32))

                grads = jax.grad(score_sum)(d_real)
                norms = jnp.linalg.norm(grads.reshape(AB, -1), axis=1)
                return (10.0 * jnp.mean(jnp.square(norms - 1.0))).astype(div.dtype)

            gp = lax.cond(apply_gp, gp_branch, lambda: jnp.zeros((), div.dtype))
            q_loss = q_loss.astype(div.dtype)
            cr_loss = jnp.zeros((), div.dtype)
            if tc.cl_reg:
                from stylex_tpu.losses.contrastive import contrastive_d_loss

                feats_vars = {"params": p["D"]}
                if "D_vq" in p:
                    feats_vars["vq"] = p["D_vq"]
                feats = lambda im: modules.D.apply(
                    feats_vars, im, return_features=True
                )
                # trace-time unroll, not vmap: SimCLR negatives live within
                # each micro-batch, and a vmapped D forward would batch the
                # Pallas blur kernels to rank 5 (unliftable on TPU)
                cl = jnp.mean(jnp.stack([
                    contrastive_d_loss(feats, k_cl_r[i], d_real[i])
                    for i in range(accum)
                ]))
                cl_gen = lax.cond(
                    apply_cl_gen,
                    lambda: jnp.mean(jnp.stack([
                        contrastive_d_loss(feats, k_cl_f[i], fake_mb[i])
                        for i in range(accum)
                    ])),
                    lambda: jnp.zeros(()),
                )
                cr_loss = (cl + cl_gen).astype(div.dtype)
            # the scan accumulates sum_i loss_i/accum == these micro-batch
            # means, so no extra /accum here
            return div + gp + q_loss + cr_loss, (div, gp, q_loss, cr_loss)

        (_, (div, gp, q_l, cr_l)), d_grads = jax.value_and_grad(d_loss, has_aux=True)(
            params["D"]
        )

        gside_grads = _tree_zeros_like({k: params[k] for k in ("encoder", "S", "G")})
        if tc.kl_rec_during_disc and cfg.arch == Arch.NEW and enc_idx:
            noise_enc = _take_mb(noise_all, enc_idx)

            def aux_loss(gp_):
                p = {**params, **gp_}
                w, enc_out = encoder_w(p, enc_imgs, enc_logits)
                fake2, _ = modules.generate(p, w, noise_enc)
                fake2_w = modules.encode(p, fake2)
                rec = tc.rec_scaling * reconstruction_loss(
                    lpips_params, enc_imgs, fake2, fake2_w, enc_out
                )
                kl = tc.kl_scaling * classifier_kl_loss(
                    enc_logits, classifier_fn(fake2)
                )
                # scan: sum over enc micro-batches of mean_i/accum
                return (rec + kl) * (len(enc_idx) / accum)

            gside_grads = jax.grad(aux_loss)(
                {k: params[k] for k in ("encoder", "S", "G")}
            )

        return (
            d_grads,
            gside_grads,
            div,
            gp,
            q_l.astype(jnp.float32),
            cr_l.astype(jnp.float32),
            rng,
        )

    def g_phase_wide(params: Params, rng, g_imgs, g_real, apply_pl, pl_mean, top_k,
                     gside_init):
        rng, keys = _key_chain(rng, 6)
        k_prior, k_noise, k_aug, k_augr, k_pl = (keys[:, j] for j in range(5))
        B = g_imgs.shape[1]
        AB = accum * B
        flat = _flat
        unflat = lambda x: _unflat(x, B)
        vaug = jax.vmap(
            lambda k, im: augment_for_discriminator(k, im, aug_prob, aug_types)
        )

        def g_loss(gp_):
            p = {**cast_tree(params), **cast_tree(gp_)}
            logits_flat = classifier_fn(flat(g_imgs)).astype(jnp.float32)
            logits_all = unflat(logits_flat)
            if cfg.arch == Arch.NEW:
                probs_all = jax.nn.softmax(logits_all, axis=-1)
                probs_flat = flat(probs_all)
            else:
                probs_all = probs_flat = None

            w_all, enc_out_enc, enc_imgs, enc_logits = _assemble_w(
                p, k_prior, g_imgs, (logits_all, probs_all), B
            )
            noise_all = jax.vmap(lambda k: image_noise(k, B, B_noise_size))(k_noise)
            fake, _ = modules.generate(p, cast(flat(w_all)), cast(flat(noise_all)))
            fake_logits = classifier_fn(fake).astype(jnp.float32)
            fake_mb = unflat(fake)
            aug_fake = vaug(k_aug, cast(fake_mb))
            fake_scores = unflat(
                modules.discriminate(p, flat(aug_fake), probs_flat).astype(
                    jnp.float32
                )
            )

            if g_needs_reals:
                aug_real = vaug(k_augr, cast(g_real))
                real_scores = unflat(
                    lax.stop_gradient(
                        modules.discriminate(p, flat(aug_real), probs_flat)
                    ).astype(jnp.float32)
                )
                gen = jnp.mean(jax.vmap(dual_contrastive_loss)(fake_scores, real_scores))
            else:
                # per-micro-batch top-k (`stylex_train.py:1399-1405`)
                sorted_scores = jnp.sort(fake_scores, axis=1)
                mask = (jnp.arange(B)[None, :] < top_k).astype(sorted_scores.dtype)
                per_mb = jnp.sum(sorted_scores * mask, axis=1) / jnp.maximum(
                    top_k, 1
                ).astype(sorted_scores.dtype)
                gen = jnp.mean(per_mb)

            def pl_branch():
                # ONE batched path-length grad over all accum*B samples —
                # the projection sum decouples per sample, so per-sample
                # grads (and hence per-micro-batch penalties) match the
                # sequential loop exactly; per-micro-batch pl-noise keys are
                # replayed via a vmapped draw (pure RNG — no Pallas inside).
                w_flat = flat(w_all)
                noise_flat = flat(noise_all)

                def proj(wf):
                    images = modules.generate(p, wf, noise_flat)[0]
                    num_pixels = images.shape[1] * images.shape[2]
                    pl_noise = jax.vmap(
                        lambda k: jax.random.normal(
                            k, (B,) + images.shape[1:], images.dtype
                        )
                    )(k_pl) / jnp.sqrt(jnp.asarray(num_pixels, images.dtype))
                    return jnp.sum(images * flat(pl_noise))

                pl_grads = jax.grad(proj)(w_flat)
                lengths = unflat(jnp.sqrt(
                    jnp.mean(jnp.sum(jnp.square(pl_grads), axis=2), axis=1)
                ))
                pens = jnp.mean(jnp.square(lengths - pl_mean), axis=1)
                pens = jnp.where(pl_mean >= 0, pens, 0.0)
                # scan keeps the LAST micro-batch's mean length
                return jnp.mean(pens), jnp.mean(lengths[-1])

            pl_pen, pl_len = lax.cond(
                apply_pl, pl_branch, lambda: (jnp.zeros(()), jnp.zeros(()))
            )

            rec = kl = jnp.zeros(())
            if enc_idx:
                fake_enc = _take_mb(fake_mb, enc_idx)
                fake_logits_enc = _take_mb(unflat(fake_logits), enc_idx)
                fake_w = modules.encode(p, fake_enc)
                scale = len(enc_idx) / accum
                rec = eff_rec * scale * reconstruction_loss(
                    lpips_params, enc_imgs, fake_enc, fake_w, enc_out_enc
                )
                kl = eff_kl * scale * classifier_kl_loss(enc_logits, fake_logits_enc)

            total = gen + pl_pen + rec + kl
            return total, (gen, rec, kl, pl_len)

        gsub = {k: params[k] for k in ("encoder", "S", "G")}
        (_, (gen, rec, kl, pl_len)), grads = jax.value_and_grad(g_loss, has_aux=True)(
            gsub
        )
        g_grads = _tree_add(gside_init, grads)
        pl_last = jnp.where(apply_pl, pl_len, jnp.zeros(()))
        return g_grads, gen, rec, kl, pl_last, rng

    if tc.fused_microbatches:
        d_phase_impl, g_phase_impl = d_phase_wide, g_phase_wide
    else:
        d_phase_impl, g_phase_impl = d_phase, g_phase

    # ------------------------------------------------------------ full step
    def train_step(state: StylExTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        # uint8 batches (the loader's quantized transfer format — 4x less
        # host->device traffic) are normalised to [0,1] float32 on device;
        # float batches pass through unchanged. Dequantised to f32 (not
        # compute_dtype): the per-site cast() calls below own the bf16
        # conversion, and e.g. the gradient penalty runs on f32 images.
        batch = {
            k: v.astype(jnp.float32) / 255.0
            if jnp.issubdtype(v.dtype, jnp.unsignedinteger) else v
            for k, v in batch.items()
        }
        params = state.params
        step = state.step
        apply_gp = step % tc.gp_every == 0
        apply_pl = (
            (not tc.no_pl_reg)
            & (step > tc.pl_start_step)
            & (step % tc.pl_every == 0)
        )
        top_k = batch.get("top_k", jnp.asarray(batch["g_imgs"].shape[1], jnp.int32))
        g_real = batch.get("g_real", batch["g_imgs"])

        apply_cl_gen = step > 20_000
        rng_d, rng_g = jax.random.split(rng)
        d_grads, gside_from_d, d_div, gp, q_l, cr_l, _ = d_phase_impl(
            params, rng_d, batch["d_real"], batch["d_enc"], apply_gp, apply_cl_gen
        )

        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, params["D"])
        new_d = jax.tree.map(jnp.add, params["D"], d_updates)
        params = {**params, "D": new_d}

        if cfg.fq_layers:
            # EMA codebook update on the last real micro-batch (the torch VQ
            # updates its codebook inside forward; here it is an explicit
            # state transition on the 'vq' collection).
            variables = {"params": params["D"], "vq": params["D_vq"]}
            last_real = batch["d_real"][-1]
            if cfg.arch == Arch.NEW:
                uniform = jnp.full(
                    (last_real.shape[0], cfg.num_classes), 1.0 / cfg.num_classes
                )
                _, upd = modules.D.apply(variables, last_real, uniform, mutable=["vq"])
            else:
                _, upd = modules.D.apply(variables, last_real, mutable=["vq"])
            params = {**params, "D_vq": upd["vq"]}
            if "E_vq" in params:
                # the encoder shares the fq config (`stylex_train.py:923`);
                # same explicit EMA transition, on the last encoder batch
                e_vars = {"params": params["encoder"], "vq": params["E_vq"]}
                _, e_upd = modules.encoder.apply(
                    e_vars, batch["d_enc"][-1], mutable=["vq"]
                )
                params = {**params, "E_vq": e_upd["vq"]}

        g_grads, g_loss, rec, kl, pl_len, _ = g_phase_impl(
            params, rng_g, batch["g_imgs"], g_real, apply_pl, state.pl_mean, top_k, gside_from_d
        )
        gsub = {k: params[k] for k in ("encoder", "S", "G")}
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, gsub)
        gsub = jax.tree.map(jnp.add, gsub, g_updates)
        params = {**params, **gsub}

        # path-length running mean: EMA(0.99) (`stylex_train.py:1120,1467-1470`)
        new_pl = jnp.where(
            state.pl_mean < 0, pl_len, state.pl_mean * 0.99 + 0.01 * pl_len
        )
        pl_mean = jnp.where(apply_pl, new_pl, state.pl_mean)

        # EMA of S and G every 10 steps after 20k (`:1475-1476`), hard reset
        # every 1000 until 25k (`:1478-1479`).
        do_ema = (step % tc.ema_every == 0) & (step > tc.ema_start_step)
        do_reset = (step <= tc.ema_reset_until) & (step % tc.ema_reset_every == 2)
        live = {"SE": params["S"], "GE": params["G"]}
        averaged = ema_update(state.ema_params, live, tc.ema_beta)
        ema = jax.tree.map(
            lambda old, avg, cur: jnp.where(do_reset, cur, jnp.where(do_ema, avg, old)),
            state.ema_params,
            averaged,
            live,
        )

        new_state = state.replace(
            step=step + 1,
            params=params,
            ema_params=ema,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            pl_mean=pl_mean,
        )
        metrics = {
            "d_loss": d_div,
            "g_loss": g_loss,
            "rec_loss": rec,
            "kl_loss": kl,
            "gp": gp,
            "pl_mean": pl_mean,
        }
        # like the reference's print_log, Q/CR only appear when the features
        # are enabled (`stylex_train.py:1700-1715` exists() filter)
        if cfg.fq_layers:
            metrics["q_loss"] = q_l
        if tc.cl_reg:
            metrics["cr_loss"] = cr_l
        return new_state, metrics

    return train_step
