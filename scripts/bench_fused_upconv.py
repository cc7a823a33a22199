"""Feasibility microbench: polyphase fused upsample+conv vs materialized.

The generator's block entry is ``conv3x3(upsample2x_bilinear(x), w)``
(`models/generator.py:141` + modconv): XLA must materialize the 4x
upsampled activation in HBM before the conv reads it back. The polyphase
rewrite composes the bilinear taps into the conv kernel — one conv on the
COARSE grid producing 4*Cout channels, then depth-to-space. Same FLOPs,
skips the fine-grid intermediate (StyleGAN2's own CUDA path is the same
trick: upfirdn2d folded into a strided transposed conv).

The composition itself is the shipped library op
(:func:`stylex_tpu.ops.upconv.compose_upsample2x_kernel` /
:func:`~stylex_tpu.ops.upconv.upsample2x_conv3x3_same`); this script only
answers "how much faster on this chip" at generator shapes, for three
variants: the materialized baseline, the interior-only polyphase conv
(pure HBM question), and the shipped exact op (incl. boundary strips).

Usage: python scripts/bench_fused_upconv.py [--f32]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from stylex_tpu.ops.upconv import (  # noqa: E402
    compose_upsample2x_kernel,
    upsample2x_conv3x3_same,
)
from stylex_tpu.utils.timing import measure_op  # noqa: E402


def baseline(x, w):
    b, h, wd, c = x.shape
    y = jax.image.resize(x, (b, 2 * h, 2 * wd, c), method="bilinear")
    return jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def fused_interior(x, wstar):
    """Polyphase conv + depth-to-space only (borders wrong by design —
    isolates the HBM-traffic question from the boundary-strip cost)."""
    b, h, wd, c = x.shape
    z = jax.lax.conv_general_dilated(
        x, wstar, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    cout = z.shape[-1] // 4
    z = z.reshape(b, h, wd, 2, 2, cout)
    z = z.transpose(0, 1, 3, 2, 4, 5)  # b, h, py, w, px, cout
    return z.reshape(b, 2 * h, 2 * wd, cout)


def main():
    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    # generator-block entry shapes for the 64px sweep (batch=chunk 616 is
    # the flat sweep's resident batch; also train-ish batch 32) and 256px.
    cases = [
        (616, 8, 256, 128),
        (616, 16, 128, 64),
        (616, 32, 64, 32),
        (32, 16, 128, 64),
        (32, 32, 64, 32),
        (16, 64, 128, 64),
        (16, 128, 64, 32),
    ]
    print(f"dtype={dtype.__name__}")
    for b, h, cin, cout in cases:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, h, cin), dtype)
        w = jax.random.normal(key, (3, 3, cin, cout), jnp.float32)
        wstar = compose_upsample2x_kernel(w).astype(dtype)
        w = w.astype(dtype)
        try:
            t0 = measure_op(baseline, [x, w], n_pair=(4, 16)).seconds
            t1 = measure_op(fused_interior, [x, wstar], n_pair=(4, 16)).seconds
            t2 = measure_op(
                lambda v: upsample2x_conv3x3_same(v, w), [x], n_pair=(4, 16)
            ).seconds
        except Exception as e:
            print(f"b{b} {h}x{h} {cin}->{cout}: FAILED {type(e).__name__}: {e}")
            continue
        # sanity: shipped op agrees with baseline EVERYWHERE, interior-only
        # variant on the interior
        a = baseline(x, w)
        s = upsample2x_conv3x3_same(x, w)
        err_all = float(jnp.max(jnp.abs(a - s)) / (jnp.max(jnp.abs(a)) + 1e-6))
        f = fused_interior(x, wstar)[:, 4:-4, 4:-4, :]
        err_int = float(
            jnp.max(jnp.abs(a[:, 4:-4, 4:-4, :] - f)) / (jnp.max(jnp.abs(a)) + 1e-6)
        )
        print(
            f"b{b} {h}x{h} {cin}->{cout}: baseline {t0*1e3:.3f} ms, "
            f"interior {t1*1e3:.3f} ms, shipped {t2*1e3:.3f} ms, "
            f"speedup {t0/t2:.2f}x, rel-err {err_all:.2e} (int {err_int:.2e})"
        )


if __name__ == "__main__":
    main()
