"""AttFind throughput benchmark — the reference's headline workload.

Baseline (BASELINE.md): the reference sweeps 250 images x 2464 StyleSpace
coordinates x 2 directions as sequential batch-1 generator+classifier
forwards — ~5 h on the authors' GPU, i.e. ~68 perturbed forwards
("styles")/sec. This benchmark times the same 64px plant-config workload
(StylEx generator + MobileNetV2 classifier, one perturbation per forward)
as batched on-device sweeps and reports styles/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_STYLES_PER_SEC = 68.0


def main() -> None:
    import os

    from stylex_tpu.config import ModelConfig
    from stylex_tpu.models import build_stylex, init_stylex_params
    from stylex_tpu.models.classifiers import build_classifier
    from stylex_tpu.ops.latents import expand_styles

    cfg = ModelConfig(image_size=64)
    modules = build_stylex(cfg)
    params = init_stylex_params(jax.random.PRNGKey(0), modules)
    clf = build_classifier("mobilenet", cfg.image_size)
    C = modules.total_style_coords  # 2464

    coord_batch = 616  # divides 2*2464 = 4928 into 8 chunks
    num_images = 4

    # TPU-native precision: the sweep runs in bf16 (set STYLEX_BENCH_F32=1
    # to measure the fp32 path instead).
    dtype = jnp.float32 if os.environ.get("STYLEX_BENCH_F32") else jnp.bfloat16
    p = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    clf_vars = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, clf.variables
    )
    clf.variables = clf_vars

    @jax.jit
    def sweep(w, noise, coord_idx, shift, base_logits):
        # one-hot deltas built on device from (index, shift) pairs — the
        # same scheme attfind_extraction uses (KBs to the device, not MBs)
        n = coord_idx.shape[0]
        deltas = jax.nn.one_hot(coord_idx, C, dtype=dtype) * shift[:, None].astype(dtype)
        w_styles = expand_styles(jnp.broadcast_to(w, (n, w.shape[-1])), modules.num_layers)
        noise_b = jnp.broadcast_to(noise, (n,) + noise.shape[1:])
        gen, _ = modules.generate(
            p, w_styles.astype(dtype), noise_b.astype(dtype), style_delta=deltas
        )
        return clf.classify_images(gen).astype(jnp.float32) - base_logits

    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (cfg.latent_dim,))
    noise = jax.random.uniform(key, (1, cfg.image_size, cfg.image_size, 1))
    base_logits = jnp.zeros((cfg.num_classes,))
    coord_ids = np.tile(np.arange(C, dtype=np.int32), 2)
    shifts = np.concatenate([np.full(C, 0.5, np.float32), np.full(C, -0.5, np.float32)])

    # warmup/compile
    out = sweep(w, noise, jnp.asarray(coord_ids[:coord_batch]),
                jnp.asarray(shifts[:coord_batch]), base_logits)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    total = 0
    for _ in range(num_images):
        for start in range(0, 2 * C, coord_batch):
            ids = jnp.asarray(coord_ids[start : start + coord_batch])
            sh = jnp.asarray(shifts[start : start + coord_batch])
            out = sweep(w, noise, ids, sh, base_logits)
            total += ids.shape[0]
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    styles_per_sec = total / dt
    print(
        json.dumps(
            {
                "metric": "attfind_styles_per_sec",
                "value": round(styles_per_sec, 1),
                "unit": "styles/s",
                "vs_baseline": round(styles_per_sec / BASELINE_STYLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    import os
    import traceback

    try:
        main()
    except Exception:
        # fall back to the fp32 path so the driver always gets a line
        traceback.print_exc(file=sys.stderr)
        os.environ["STYLEX_BENCH_F32"] = "1"
        main()
