"""A/B the fused polyphase resamplers on the real chip (docs/ROOFLINE.md r3).

Measures the shipping 64px bf16 AttFind sweep fused vs
STYLEX_TPU_NO_FUSED_UPCONV=1 (the literal reference-shaped resample graph)
at the bench chunk, plus a fused knee re-check at 2x chunk — the fusions
cut bytes/chunk, so the spill point may have moved.

    python scripts/ab_fused_sweep.py [--skip-unfused] [--chunks 616,1232]

Prints one flushed JSON line per measurement (relay-safe: partial results
survive a timeout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def run(label: str, chunk: int, unfused: bool) -> None:
    # env flag is read at trace time; set before building the sweep
    if unfused:
        os.environ["STYLEX_TPU_NO_FUSED_UPCONV"] = "1"
    else:
        os.environ.pop("STYLEX_TPU_NO_FUSED_UPCONV", None)
    import jax.numpy as jnp

    import bench

    t0 = time.monotonic()
    v, _ = bench.bench_attfind(64, coord_batch=chunk, dtype=jnp.bfloat16,
                               with_mfu=False)
    print(
        json.dumps(
            {
                "case": label,
                "chunk": chunk,
                "styles_per_sec": round(v, 1),
                "ms_per_chunk": round(1e3 * chunk / v, 2),
                "wall_s": round(time.monotonic() - t0, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--skip-unfused", action="store_true")
    p.add_argument("--chunks", default="616,1232")
    args = p.parse_args()

    from stylex_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    chunks = [int(c) for c in args.chunks.split(",")]
    run("fused", chunks[0], unfused=False)
    if not args.skip_unfused:
        run("unfused", chunks[0], unfused=True)
    for c in chunks[1:]:
        run("fused", c, unfused=False)


if __name__ == "__main__":
    main()
