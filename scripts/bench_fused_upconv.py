"""Feasibility microbench: polyphase fused upsample+conv vs materialized.

The generator's block entry is ``conv3x3(upsample2x_bilinear(x), w)``
(`models/generator.py:141` + modconv): XLA must materialize the 4x
upsampled activation in HBM before the conv reads it back. The polyphase
rewrite composes the bilinear taps into the conv kernel — one conv on the
COARSE grid producing 4*Cout channels, then depth-to-space. Same FLOPs,
skips the fine-grid intermediate (StyleGAN2's own CUDA path is the same
trick: upfirdn2d folded into a strided transposed conv).

This script only answers "is it faster on this chip" at generator shapes —
boundary-exactness is handled in the library implementation, not here
(interior taps only; the timing question is HBM traffic, which border
corrections don't change).

Usage: python scripts/bench_fused_upconv.py [--f32]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from stylex_tpu.utils.timing import measure_op  # noqa: E402

# per-axis coarse-tap x fine-tap composition (interior; half-pixel bilinear):
# phase 0: z[2i]  uses x[i-1],x[i],x[i+1] with weights .75w0+.25w1 | .25w0+.75w1+.75w2 | .25w2
# phase 1: z[2i+1] uses                                .25w0       | .75w0+.75w1+.25w2 | .25w1+.75w2
U = {
    0: np.array([[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]]),
    1: np.array([[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]]),
}
# U[p][fine_tap u, coarse_tap a] convention: contribution of w[u] to coarse tap a.


def compose_kernel(w: np.ndarray) -> np.ndarray:
    """w: (3,3,Cin,Cout) fine kernel -> (3,3,Cin,4*Cout) coarse kernel.

    Output channel layout: [py*2+px interleaved per original channel] so a
    depth_to_space on the last dim reproduces the fine grid.
    """
    kh, kw, cin, cout = w.shape
    out = np.zeros((3, 3, cin, 2, 2, cout), w.dtype)
    for py in (0, 1):
        for px in (0, 1):
            # W*[a,b] = sum_{u,v} U[py][u,a] * U[px][v,b] * w[u,v]
            comp = np.einsum("ua,vb,uvio->abio", U[py], U[px], w)
            out[:, :, :, py, px, :] = comp
    return out.reshape(3, 3, cin, 4 * cout)


def baseline(x, w):
    b, h, wd, c = x.shape
    y = jax.image.resize(x, (b, 2 * h, 2 * wd, c), method="bilinear")
    return jax.lax.conv_general_dilated(
        y, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def fused(x, wstar):
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
        wstar = jnp.asarray(compose_kernel(np.asarray(w)), dtype)
        w = w.astype(dtype)
        try:
            t0 = measure_op(baseline, [x, w], n_pair=(4, 16)).seconds
            t1 = measure_op(fused, [x, wstar], n_pair=(4, 16)).seconds
        except Exception as e:
            print(f"b{b} {h}x{h} {cin}->{cout}: FAILED {type(e).__name__}: {e}")
            continue
        # sanity: interiors agree (borders differ by design here)
        a = baseline(x, w)[:, 4:-4, 4:-4, :]
        f = fused(x, wstar)[:, 4:-4, 4:-4, :]
        err = float(jnp.max(jnp.abs(a - f)) / (jnp.max(jnp.abs(a)) + 1e-6))
        print(
            f"b{b} {h}x{h} {cin}->{cout}: baseline {t0*1e3:.3f} ms, "
            f"fused {t1*1e3:.3f} ms, speedup {t0/t1:.2f}x, interior rel-err {err:.2e}"
        )


if __name__ == "__main__":
    main()
