"""Anti-aliasing blur and fused resample ops (NHWC).

The reference blurs with a normalized 3-tap binomial filter
[1,2,1]⊗[1,2,1]/16 via ``kornia.filters.filter2d`` whose default border mode
is *reflect* (`/root/reference/stylex/stylex_train.py:144-153`). On TPU a
small depthwise filter is bandwidth-bound, so we express it as two separable
1-D convolutions that XLA fuses with neighbouring elementwise work, and we
provide fused ``upsample_bilinear_2x + blur`` / ``blur + strided-conv``
compositions used by the generator / discriminator resample paths.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax
from stylex_tpu.ops.fusion import resample_fusion_enabled

__all__ = [
    "blur3",
    "blur3_xla",
    "upsample2x_bilinear",
    "upsample2x_blur",
    "upsample2x_blur_unfused",
    "downsample_blur",
]

# Normalized binomial taps: outer([1,2,1],[1,2,1]) / 16.
_TAPS = (0.25, 0.5, 0.25)


def _sep_conv_axis(x: jax.Array, axis: int) -> jax.Array:
    """Apply the normalized [1,2,1]/4 filter along one spatial axis (reflect)."""
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (1, 1)
    xp = jnp.pad(x, pad_width, mode="reflect")
    lo = lax.slice_in_dim(xp, 0, x.shape[axis], axis=axis)
    mid = lax.slice_in_dim(xp, 1, x.shape[axis] + 1, axis=axis)
    hi = lax.slice_in_dim(xp, 2, x.shape[axis] + 2, axis=axis)
    t0, t1, t2 = _TAPS
    return lo * jnp.asarray(t0, x.dtype) + mid * jnp.asarray(t1, x.dtype) + hi * jnp.asarray(t2, x.dtype)


def blur3_xla(x: jax.Array) -> jax.Array:
    """XLA formulation of the blur (reflect pad + two separable passes)."""
    return _sep_conv_axis(_sep_conv_axis(x, 1), 2)


@jax.custom_vjp
def blur3(x: jax.Array) -> jax.Array:
    """3×3 normalized binomial blur with reflect padding.

    Matches the reference ``Blur`` module (kornia ``filter2d`` with
    ``normalized=True`` and reflect border, `stylex_train.py:144-153`).

    On TPU the f32 forward runs as the fused Pallas kernel
    (:mod:`stylex_tpu.ops.pallas_blur`, bit-exact); elsewhere (and under
    interpretation) the XLA form is used. The op is linear, so the backward
    pass is the exact XLA-derived vjp regardless of which forward ran.

    Args:
      x: (batch, H, W, C) feature map.
    """
    # Lane-dim DMA slices must cover whole 128-lane tiles; narrower channel
    # counts (e.g. the 3-channel RGB skip) stay on the XLA path. Dispatch is
    # by measurement (docs/TIMING.md): honest slope-timed micro-benchmarks
    # show the kernel ahead of XLA in f32 at D-path shapes and behind in
    # bf16 (XLA's 2-byte lowering is near-roofline), and full-train-step
    # A/B runs show the choice is performance-neutral at step granularity
    # (the blur is a tiny fraction of a step) — so the f32 gate stands.
    # The platform half of the gate uses ``lax.platform_dependent`` (resolved
    # per *lowering* platform), not ``jax.default_backend()``: a TPU-backed
    # process may still trace programs for its host CPU devices (host-side
    # param init, the virtual CPU test mesh), where the Mosaic kernel can't
    # lower.
    if (
        x.shape[-1] % 128 == 0
        and x.dtype == jnp.float32
        and not os.environ.get("STYLEX_TPU_NO_PALLAS")
    ):
        from stylex_tpu.ops.pallas_blur import blur3_pallas

        return lax.platform_dependent(x, tpu=blur3_pallas, default=blur3_xla)
    return blur3_xla(x)


def _blur3_fwd(x):
    return blur3(x), None


def _blur3_bwd(_, g):
    # blur3 is linear with a symmetric kernel; its vjp is the vjp of the XLA
    # formulation evaluated at any primal.
    _, vjp_fn = jax.vjp(blur3_xla, jnp.zeros_like(g))
    return (vjp_fn(g)[0],)


blur3.defvjp(_blur3_fwd, _blur3_bwd)


def upsample2x_bilinear_xla(x: jax.Array) -> jax.Array:
    """XLA formulation of the bilinear 2× upsample."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


@jax.custom_vjp
def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """Bilinear 2× upsample, half-pixel centers (torch ``align_corners=False``).

    Matches ``nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=False)`` used by ``GeneratorBlock`` / ``RGBBlock``
    (`stylex_train.py:604-629,677-686`).

    Dispatch is by measurement (slope protocol, scripts/
    bench_pallas_upsample.py, v5e): in bf16 XLA's lowering is already
    near the HBM roofline (450-760 GB/s) and both Pallas kernels lose,
    so bf16 always takes XLA. In f32 XLA drops to ~300 GB/s and the
    batch-pipelined Pallas kernel wins up to 1.4x on the training
    shapes it compiles for (whole padded rows fit VMEM; pow2 batch
    tiles; spatial and channels inside Mosaic's tiling limits), so
    those take Pallas. The op is linear; the backward pass is always
    the exact XLA-derived vjp.
    """
    b, h, w, c = x.shape
    if (
        x.dtype == jnp.float32
        and c % 128 == 0
        and 4 <= h <= 16
        and h == w
        and b <= 64  # measured: wins at train batches (3.0x @ b8 16x16x512), loses/OOMs at sweep batches
        and not os.environ.get("STYLEX_TPU_NO_PALLAS")
    ):
        from stylex_tpu.ops.pallas_upsample import upsample2x_bilinear_pallas_batched

        # per-lowering-platform dispatch (see blur3): TPU takes the Pallas
        # kernel, any CPU lowering in the same process takes XLA.
        return lax.platform_dependent(
            x,
            tpu=upsample2x_bilinear_pallas_batched,
            default=upsample2x_bilinear_xla,
        )
    return upsample2x_bilinear_xla(x)


def _ups2x_fwd(x):
    return upsample2x_bilinear(x), None


def _ups2x_bwd(_, g):
    b, h2, w2, c = g.shape
    _, vjp_fn = jax.vjp(
        upsample2x_bilinear_xla, jnp.zeros((b, h2 // 2, w2 // 2, c), g.dtype)
    )
    return (vjp_fn(g)[0],)


upsample2x_bilinear.defvjp(_ups2x_fwd, _ups2x_bwd)


def upsample2x_blur_unfused(x: jax.Array) -> jax.Array:
    """The literal composition: bilinear 2× upsample, then the binomial blur
    (the RGB skip-path resampler, `stylex_train.py:612-616`). Kept as the
    reference form for the fused polyphase op below."""
    return blur3(upsample2x_bilinear(x))


# Per-axis polyphase taps of blur3 ∘ upsample2x_bilinear on the clamp-padded
# coarse grid. Derivation (1-D, half-pixel bilinear y[2i]=¼x[i-1]+¾x[i],
# y[2i+1]=¾x[i]+¼x[i+1]; blur z[f]=¼y[f-1]+½y[f]+¼y[f+1]):
#   z[2i]   = ¼y[2i-1] + ½y[2i]   + ¼y[2i+1] = 0.3125·x[i-1] + 0.625·x[i] + 0.0625·x[i+1]
#   z[2i+1] = ¼y[2i]   + ½y[2i+1] + ¼y[2i+2] = 0.0625·x[i-1] + 0.625·x[i] + 0.3125·x[i+1]
# With the coarse input clamp-padded, these are exact for every fine index
# except f=0 and f=2N-1, where the blur's *reflect* padding composes with the
# upsample's edge clamp into 2-tap closed forms instead:
#   z[0]    = ½y[0] + ½y[1]       = 0.875·x[0]   + 0.125·x[1]
#   z[2N-1] = ½y[2N-2] + ½y[2N-1] = 0.125·x[N-2] + 0.875·x[N-1]
# All taps are exact dyadics (representable in bf16). Verified against the
# unfused composition in tests/test_ops.py.
_UPBLUR_EVEN = (0.3125, 0.625, 0.0625)
_UPBLUR_ODD = (0.0625, 0.625, 0.3125)


def _upsample2x_blur_axis(x: jax.Array, axis: int) -> jax.Array:
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="edge")
    lo = lax.slice_in_dim(xp, 0, n, axis=axis)
    mid = lax.slice_in_dim(xp, 1, n + 1, axis=axis)
    hi = lax.slice_in_dim(xp, 2, n + 2, axis=axis)

    def tap(c):
        return jnp.asarray(c, x.dtype)

    even = lo * tap(_UPBLUR_EVEN[0]) + mid * tap(_UPBLUR_EVEN[1]) + hi * tap(_UPBLUR_EVEN[2])
    odd = lo * tap(_UPBLUR_ODD[0]) + mid * tap(_UPBLUR_ODD[1]) + hi * tap(_UPBLUR_ODD[2])
    z = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    z = z.reshape(shape)
    x0 = lax.slice_in_dim(x, 0, 1, axis=axis)
    x1 = lax.slice_in_dim(x, 1, 2, axis=axis)
    xm2 = lax.slice_in_dim(x, n - 2, n - 1, axis=axis)
    xm1 = lax.slice_in_dim(x, n - 1, n, axis=axis)
    first = x0 * tap(0.875) + x1 * tap(0.125)
    last = xm2 * tap(0.125) + xm1 * tap(0.875)
    return lax.concatenate(
        [first, lax.slice_in_dim(z, 1, 2 * n - 1, axis=axis), last], dimension=axis
    )


def upsample2x_blur(x: jax.Array) -> jax.Array:
    """Bilinear 2× upsample followed by the binomial blur, as ONE separable
    polyphase pass on the coarse grid.

    The RGB skip-path resampler (`stylex_train.py:612-616`). The unfused
    composition writes the 4×-area fine grid (gather-lowered resize), reads
    it back, and blurs it — two fine-grid HBM round trips for a 3-channel
    map at every block. Both ops are linear and separable, so they collapse
    per axis into two 3-tap phase stencils on the coarse grid (taps above);
    the fine grid is produced once, already blurred. Exact to rounding,
    including the clamp/reflect boundary rows (closed forms above). The op
    is linear; autodiff through the slice/pad/concat graph is its exact
    transpose. ``STYLEX_TPU_NO_FUSED_UPCONV`` opts out (same switch as the
    generator's fused entry conv — one flag restores the literal
    reference-shaped compute graph everywhere).
    """
    b, h, w, c = x.shape
    if h < 2 or w < 2 or not resample_fusion_enabled():
        return upsample2x_blur_unfused(x)
    return _upsample2x_blur_axis(_upsample2x_blur_axis(x, 1), 2)


def downsample_blur(x: jax.Array) -> jax.Array:
    """Blur used immediately before a strided conv in the discriminator
    downsample path (`stylex_train.py:733-736`). The strided conv itself
    lives with the model (it has weights); the blur half is here."""
    return blur3(x)
