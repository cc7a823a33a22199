"""Per-stage FLOP/time breakdown of the TRAIN step (VERDICT r3 Next #2).

Companion to profile_sweep.py: slope-times the components of one alternating
train step at the reference config (batch 4 x grad-accum 8,
`/root/reference/stylex/cli.py:95-98`) in isolation — generator fwd and
fwd+bwd at the fused width (accum*B), D trunk fwd and fwd+bwd at 2*accum*B,
encoder, frozen classifier, LPIPS — alongside the full fused step and the
literal scan step, each with XLA cost-analysis FLOPs -> MFU. Read together
with scripts/roofline_train.py (the analytic per-op ceiling) this is the
measured-vs-ceiling table for docs/ROOFLINE.md.

    python scripts/profile_train.py [--image-size 64] [--batch 4] [--accum 8]
                                    [--bf16] [--remat]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def cost_of(fn, *args):
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--accum", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true")
    args = p.parse_args()

    from stylex_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import bench
    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.losses import d_hinge_loss
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.classifiers import build_classifier
    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.ops.latents import expand_styles, image_noise
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step
    from stylex_tpu.utils.device import init_on_host
    from stylex_tpu.utils.timing import measure_chained, measure_op

    dtype_name = "bfloat16" if args.bf16 else "float32"
    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    peak = bench._peak_flops(compute_dtype)
    S, B, A = args.image_size, args.batch, args.accum
    AB = A * B
    n_enc = A // 2  # alternating schedule

    cfg = ModelConfig(image_size=S, remat=args.remat)
    modules = build_stylex(cfg)
    clf = build_classifier("mobilenet", S)
    lp = init_lpips_params(jax.random.PRNGKey(1))

    def build_inputs(key):
        w = jax.random.normal(key, (AB, cfg.latent_dim), compute_dtype)
        imgs = jax.random.uniform(
            jax.random.fold_in(key, 1), (AB, S, S, 3), compute_dtype
        )
        imgs2 = jax.random.uniform(
            jax.random.fold_in(key, 2), (2 * AB, S, S, 3), compute_dtype
        )
        enc_imgs = imgs[: n_enc * B]
        return w, imgs, imgs2, enc_imgs

    w, imgs, imgs2, enc_imgs = init_on_host(build_inputs, jax.random.PRNGKey(2))
    tc = TrainConfig(batch_size=B, gradient_accumulate_every=A, aug_prob=0.25,
                     compute_dtype=dtype_name)
    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    params = state.params
    if args.bf16:
        params_c = jax.jit(
            lambda t: jax.tree.map(
                lambda x: x.astype(compute_dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
        )(params)
    else:
        params_c = params
    noise = jax.jit(lambda: image_noise(jax.random.PRNGKey(3), AB, S).astype(
        compute_dtype))()

    # ---- component stages (fused widths) ------------------------------------
    def g_fwd(w, noise):
        ws = expand_styles(w, modules.num_layers)
        return modules.generate(params_c, ws, noise)[0]

    def g_fwd_bwd(w, noise):
        def loss(gp_):
            ws = expand_styles(w, modules.num_layers)
            img, _ = modules.generate({**params_c, "G": gp_}, ws, noise)
            return jnp.mean(img).astype(jnp.float32)

        return jax.grad(loss)(params_c["G"])

    def d_trunk(x):
        return modules.discriminate(params_c, x)

    def d_fwd_bwd(x):
        def loss(dp):
            s = modules.discriminate({**params_c, "D": dp}, x).astype(jnp.float32)
            return d_hinge_loss(s[:AB], s[AB:])

        return jax.grad(loss)(params_c["D"])

    def enc_fwd(x):
        return modules.encode(params_c, x)

    def clf_fwd(x):
        return clf.classify_images(x)

    def lpips_fwd_bwd(a):
        # isolated LPIPS distance fwd+bwd (the rec-loss perceptual term)
        from stylex_tpu.models.lpips import lpips_distance
        from stylex_tpu.ops.latents import lpips_normalize

        def lp_loss(x):
            return jnp.mean(
                lpips_distance(lp, lpips_normalize(a), lpips_normalize(x))
            ).astype(jnp.float32)

        return jax.grad(lp_loss)(a * 0.9)

    stages = {
        f"G_fwd_b{AB}": (g_fwd, [w, noise]),
        f"G_fwd_bwd_b{AB}": (g_fwd_bwd, [w, noise]),
        f"D_trunk_b{2*AB}": (d_trunk, [imgs2]),
        f"D_fwd_bwd_b{2*AB}": (d_fwd_bwd, [imgs2]),
        f"encoder_b{n_enc*B}": (enc_fwd, [enc_imgs]),
        f"classifier_b{AB}": (clf_fwd, [imgs]),
        f"lpips_fwd_bwd_b{n_enc*B}": (lpips_fwd_bwd, [enc_imgs]),
    }

    out = {"image_size": S, "batch": B, "accum": A, "dtype": dtype_name}
    for name, (fn, a) in stages.items():
        t = measure_op(fn, a, n_pair=(4, 16) if S <= 64 else (2, 8))
        flops, bytes_acc = cost_of(fn, *a)
        out[name] = {
            "ms": round(t.seconds * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "mfu": round(flops / t.seconds / peak, 4) if flops else 0.0,
            "eff_GBps": round(bytes_acc / t.seconds / 1e9, 1) if bytes_acc else 0.0,
        }
        print(name, out[name], flush=True)

    # ---- full steps: fused vs literal scan -----------------------------------
    for fused in (True, False):
        tc_i = TrainConfig(batch_size=B, gradient_accumulate_every=A,
                           aug_prob=0.25, compute_dtype=dtype_name,
                           fused_microbatches=fused)
        st, g_tx_i, d_tx_i = create_train_state(
            jax.random.PRNGKey(0), modules, cfg, tc_i)
        step = make_train_step(modules, clf.classify_images, lp, cfg, tc_i,
                               g_tx_i, d_tx_i)
        bshape = (A, B, S, S, 3)
        batch_d = {
            name: jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(4), i), bshape)
            for i, name in enumerate(("d_real", "d_enc", "g_imgs"))
        }

        def chained(i, st):
            new, _ = step(st, batch_d, jax.random.fold_in(jax.random.PRNGKey(5), i))
            return new

        t = measure_chained(chained, st, n_pair=(2, 8) if S <= 64 else (1, 4))
        flops, bytes_acc = cost_of(step, st, batch_d, jax.random.PRNGKey(5))
        name = "full_step_fused" if fused else "full_step_scan"
        out[name] = {
            "ms": round(t.seconds * 1e3, 3),
            "imgs_per_sec": round(AB / t.seconds, 1),
            "gflops": round(flops / 1e9, 2),
            "mfu": round(flops / t.seconds / peak, 4) if flops else 0.0,
            "eff_GBps": round(bytes_acc / t.seconds / 1e9, 1) if bytes_acc else 0.0,
        }
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
