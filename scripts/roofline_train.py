"""Analytic roofline for the TRAINING step (companion to roofline_sweep.py).

Models one full alternating train step at the reference defaults
(batch 4 x grad-accum 8, `cli.py:95-98`): the D phase (encoder/prior
alternating w, G fwd, D fwd on fake+real, D backward, amortized GP) and the
G phase (G fwd, D pass-through, backward through G/S/E, plus the
encoder-input micro-batches' reconstruction LPIPS/L1 and classifier-KL
terms, `stylex_train.py:1249-1454`). Every op is lower-bounded by
max(flops/(MXU*lane_eff), bytes/HBM) exactly as in roofline_sweep.Model.

Backward multipliers (standard conv accounting):
  trained path      fwd x1, bwd x2 (dgrad + wgrad), bytes x2
  pass-through path fwd x1, bwd x1 (dgrad only, e.g. frozen classifier /
                    D inside the G loss), bytes x1

Pure host-side arithmetic; no TPU needed.

    python scripts/roofline_train.py [--image-size 64] [--batch 4] [--accum 8]
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from roofline_sweep import (  # noqa: E402
    BYTES,
    HBM_PEAK,
    MXU_PEAK,
    Model,
    _pad,
    classifier_model,
    generator_model,
)


def scaled_into(dst: Model, src: Model, fmult: float, bmult: float, tag: str):
    # flops and bytes always scale together here (fwd+bwd multiplies both),
    # so the max(mxu, hbm) bound scales linearly
    assert fmult == bmult, "equal multipliers assumed"
    for name, f, b, t, kind in src.rows:
        dst.rows.append((f"{tag} {name}", f * fmult, b * bmult, t * fmult, kind))


def discriminator_model(n, image_size, capacity=16, fmap_max=512,
                        fused_downconv=True):
    """DiscriminatorE trunk (`stylex_train.py:842-909`): per block a 1x1
    stride-2 residual conv, two 3x3 convs, and the blur+3x3-stride-2
    downsample (fused 5x5 where cout <= 128, models/layers.py)."""
    num_layers = int(math.log2(image_size) - 1)
    filters = [3] + [min((capacity * 4) * (2 ** i), fmap_max)
                     for i in range(num_layers + 1)]
    m = Model()
    s = image_size
    for i in range(num_layers):
        cin, cout = filters[i], filters[i + 1]
        last = i == num_layers - 1
        stride = 1 if last else 2
        m.conv(f"d{i} res 1x1 s{stride}", n, s, s, cin, cout, k=1, stride=stride)
        m.conv(f"d{i} conv1 {cin}->{cout}@{s}", n, s, s, cin, cout)
        m.conv(f"d{i} conv2 {cout}->{cout}@{s}", n, s, s, cout, cout)
        if not last:
            if fused_downconv and cout <= 128:
                # composed 5x5 stride-2 conv, no blur round trip
                ho = s // 2
                flops = 2 * 25 * cout * cout * ho * ho * n
                kdim = 25 * cout
                eff = (kdim / _pad(kdim, 128)) * (cout / _pad(cout, 128))
                byts = (n * s * s * cout + n * ho * ho * cout
                        + 25 * cout * cout) * BYTES
                t = max(flops / (MXU_PEAK * eff), byts / HBM_PEAK)
                m.rows.append((f"d{i} blur+down fused@{s}", flops, byts, t,
                               f"mxu eff={eff:.2f} fused"))
            else:
                m.mem(f"d{i} blur@{s}", n * 2 * s * s * cout)
                m.conv(f"d{i} down {cout}@{s}", n, s, s, cout, cout, stride=2)
            s //= 2
    m.conv("final 3x3", n, s, s, filters[-1], filters[-1])
    m.matmul("fc", n, s * s * filters[-1] // (s * s // 4), 1)  # flatten 2x2 -> fc
    return m


def lpips_model(n, image_size):
    """AlexNet-feature LPIPS forward at train resolution (two inputs are
    batched together by the caller via n)."""
    m = Model()
    s = image_size
    plan = [(3, 64, 11, 4), (64, 192, 5, 1), (192, 384, 3, 1),
            (384, 256, 3, 1), (256, 256, 3, 1)]
    for i, (cin, cout, k, stride) in enumerate(plan):
        so = max(s // stride, 1)
        m.conv(f"alex{i} {cin}->{cout}k{k}", n, s, s, cin, cout, k=k,
               stride=stride)
        s = max(so // (2 if i in (0, 1, 4) else 1), 1)
    return m


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--accum", type=int, default=8)
    args = p.parse_args()
    B, S, A = args.batch, args.image_size, args.accum

    step = Model()

    # ---------- D phase: A micro-batches ----------
    # alternating w sources: half encoder-input (E + classifier fwd), half
    # prior (mapping MLP, cheap). G fwd (no bwd - detached fake), D fwd on
    # fake+real with full backward, GP every 4 steps (double backward on
    # real) amortized.
    enc = discriminator_model(B * A // 2, S)          # encoder fwd
    scaled_into(step, enc, 1, 1, "D| E fwd")
    clf = classifier_model(B * A // 2, S)
    scaled_into(step, clf, 1, 1, "D| clf fwd")
    gen = generator_model(B * A, S, noise_batch1=False, fused_resample=True)
    scaled_into(step, gen, 1, 1, "D| G fwd (detached)")
    d = discriminator_model(B * A * 2, S)             # fake + real
    scaled_into(step, d, 1 + 2, 1 + 2, "D| D fwd+bwd")
    d_gp = discriminator_model(B * A * 2 // 4, S)     # every 4 steps, ~2x bwd
    scaled_into(step, d_gp, 2, 2, "D| GP (amortized)")

    # ---------- G phase: A micro-batches ----------
    scaled_into(step, enc, 1 + 2, 1 + 2, "G| E fwd+bwd")
    scaled_into(step, clf, 1, 1, "G| clf fwd (real)")
    gen_t = generator_model(B * A, S, noise_batch1=False, fused_resample=True)
    scaled_into(step, gen_t, 1 + 2, 1 + 2, "G| G fwd+bwd")
    d_pass = discriminator_model(B * A, S)
    scaled_into(step, d_pass, 1 + 1, 1 + 1, "G| D pass-through")
    # encoder-input micro-batches: rec loss (E on fake, LPIPS on fake+real)
    # + KL (classifier on fake, dgrad back into the image)
    scaled_into(step, enc, 1 + 1, 1 + 1, "G| E(fake) rec")
    lp = lpips_model(B * A, S)                        # two inputs batched
    scaled_into(step, lp, 1 + 1, 1 + 1, "G| LPIPS")
    scaled_into(step, clf, 1 + 1, 1 + 1, "G| clf(fake) KL")

    tot_f, tot_t = step.report(
        f"train step @ {S}px, batch {B} x accum {A} (both phases)")
    imgs = B * A
    print(f"\n== ceiling: {tot_t * 1e3:.2f} ms/step -> "
          f"{imgs / tot_t:.1f} imgs/s, MFU ceiling {tot_f / tot_t / MXU_PEAK:.3f}")


if __name__ == "__main__":
    main()
