"""Per-stage FLOP/time breakdown of the AttFind sweep (VERDICT r2 Weak #2).

Decomposes the flagship 64px bf16 sweep into its stages — one-hot delta
construction, generator synthesis, classifier forward — and slope-times
each in isolation at the bench shapes, alongside XLA cost-analysis FLOPs,
to show where the non-MXU time goes and what the roofline permits.

    python scripts/profile_sweep.py [--image-size 64] [--coord-batch 616]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def cost_of(fn, *args):
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(cost.get("flops", 0.0)), float(
            cost.get("bytes accessed", 0.0)
        )
    except Exception:
        return 0.0, 0.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--coord-batch", type=int, default=616)
    p.add_argument("--f32", action="store_true")
    args = p.parse_args()

    from stylex_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import bench
    from stylex_tpu.ops.latents import expand_styles
    from stylex_tpu.utils.timing import measure_op

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    peak = bench._peak_flops(dtype)
    S, cb = args.image_size, args.coord_batch
    cfg, modules, params, clf, C, heavy = bench._sweep_inputs(S, dtype, 4)
    w_all, noise, coords_all, minima, maxima, base = heavy
    img_ids = jnp.asarray(np.arange(cb, dtype=np.int32) % 4)
    coord_ids = jnp.asarray(np.arange(cb, dtype=np.int32) % C)
    dir_ids = jnp.asarray(np.arange(cb, dtype=np.int32) % 2)

    # ---- stage functions ---------------------------------------------------
    def deltas_fn(w_all, coords_all, minima, maxima, ii, ci, di):
        extreme = jnp.where(di, maxima[ci], minima[ci])
        shift = (extreme - coords_all[ii, ci]) * 1.0
        deltas = jax.nn.one_hot(ci, C, dtype=w_all.dtype) * shift[:, None]
        return w_all[ii], deltas

    w_chunk, deltas = jax.jit(deltas_fn)(
        w_all, coords_all, minima, maxima, img_ids, coord_ids, dir_ids
    )

    def gen_fn(w, noise, deltas):
        ws = expand_styles(w, modules.num_layers)
        # batch-1 shared noise broadcasts at the conv-output add (docs/ROOFLINE.md)
        img, _ = modules.generate(params, ws, noise, style_delta=deltas)
        return img

    imgs = jax.jit(gen_fn)(w_chunk, noise, deltas)

    def clf_fn(imgs):
        return clf.classify_images(imgs)

    def full_fn(w_all, noise, coords_all, minima, maxima, base, ii, ci, di):
        from stylex_tpu.attfind.extraction import _make_sweep_fn

        return _make_sweep_fn(
            modules, params, clf.classify_images, cfg, C, 1.0, None
        )(w_all, noise, coords_all, minima, maxima, base, ii, ci, di)

    stages = {
        "delta_construction": (
            deltas_fn,
            [w_all, coords_all, minima, maxima, img_ids, coord_ids, dir_ids],
        ),
        "generator": (gen_fn, [w_chunk, noise, deltas]),
        "classifier": (clf_fn, [imgs]),
        "full_sweep": (
            full_fn,
            [w_all, noise, coords_all, minima, maxima, base, img_ids, coord_ids, dir_ids],
        ),
    }

    out = {"image_size": S, "coord_batch": cb, "dtype": str(dtype.__name__)}
    total_t = 0.0
    for name, (fn, a) in stages.items():
        t = measure_op(fn, a, n_pair=(4, 16))
        flops, bytes_acc = cost_of(fn, *a)
        mfu = flops / t.seconds / peak if flops else 0.0
        bw = bytes_acc / t.seconds / 1e9 if bytes_acc else 0.0
        out[name] = {
            "ms": round(t.seconds * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "mfu": round(mfu, 4),
            "eff_GBps": round(bw, 1),
            "styles_per_sec": round(cb / t.seconds, 0),
        }
        if name != "full_sweep":
            total_t += t.seconds
        print(name, out[name], flush=True)
    out["stage_sum_ms"] = round(total_t * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
