"""Analytic roofline for the AttFind sweep (VERDICT r2 Next #3).

Enumerates every significant op in one flat-sweep chunk (generator blocks,
to-noise denses, resamples, MobileNetV2 classifier) at the bench config and
lower-bounds its device time by

    T_op = max( flops / (MXU_peak * lane_eff),  bytes / HBM_peak,
                vpu_flops / VPU_peak )

where ``lane_eff`` accounts for 128-lane padding of the contraction/output
channel dims (the systolic array computes padded tiles whether or not the
channels fill them). Summing gives the speed-of-light chunk time and hence
the maximum achievable styles/s and "MFU" for this op mix — the honest
ceiling to compare the measured number against (39% measured MFU is NOT
61% waste if the op mix's ceiling is ~50%).

Pure host-side arithmetic; no TPU needed.

    python scripts/roofline_sweep.py [--image-size 64] [--coord-batch 616]
"""

from __future__ import annotations

import argparse
import math
import sys

sys.path.insert(0, ".")

# Pure host-side arithmetic — never let the axon TPU plugin touch the relay.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MXU_PEAK = 197e12  # v5e bf16
VPU_PEAK = 3.2e12  # v5e vector unit, ~order-of-magnitude
HBM_PEAK = 0.819e12
BYTES = 2  # bf16


def _pad(x, m):
    return m * math.ceil(x / m)


class Model:
    def __init__(self):
        self.rows = []

    def conv(self, name, n, h, w, cin, cout, k=3, stride=1, dw=False):
        ho, wo = h // stride, w // stride
        if dw:
            flops = 2 * k * k * cin * ho * wo * n
            byts = (n * h * w * cin + n * ho * wo * cin + k * k * cin) * BYTES
            t = max(flops / VPU_PEAK, byts / HBM_PEAK)
            self.rows.append((name, flops, byts, t, "dw/VPU"))
            return
        flops = 2 * k * k * cin * cout * ho * wo * n
        kdim = k * k * cin
        lane_eff = (kdim / _pad(kdim, 128)) * (cout / _pad(cout, 128))
        byts = (n * h * w * cin + n * ho * wo * cout + k * k * cin * cout) * BYTES
        t = max(flops / (MXU_PEAK * lane_eff), byts / HBM_PEAK)
        self.rows.append((name, flops, byts, t, f"mxu eff={lane_eff:.2f}"))

    def matmul(self, name, m, kdim, ndim):
        flops = 2 * m * kdim * ndim
        lane_eff = (kdim / _pad(kdim, 128)) * (ndim / _pad(ndim, 128))
        byts = (m * kdim + m * ndim + kdim * ndim) * BYTES
        t = max(flops / (MXU_PEAK * lane_eff), byts / HBM_PEAK)
        self.rows.append((name, flops, byts, t, f"mxu eff={lane_eff:.2f}"))

    def mem(self, name, elems):
        byts = elems * BYTES
        self.rows.append((name, 0.0, byts, byts / HBM_PEAK, "HBM"))

    def report(self, label, peak=MXU_PEAK):
        tot_f = sum(r[1] for r in self.rows)
        tot_b = sum(r[2] for r in self.rows)
        tot_t = sum(r[3] for r in self.rows)
        print(f"--- {label}: {tot_f/1e9:.1f} GFLOP, {tot_b/1e6:.0f} MB, "
              f"T_ideal={tot_t*1e3:.3f} ms, ceiling MFU={tot_f/tot_t/peak:.3f}")
        for name, f, b, t, kind in sorted(self.rows, key=lambda r: -r[3])[:12]:
            print(f"    {name:<28} {f/1e9:8.2f} GF {b/1e6:7.1f} MB "
                  f"{t*1e6:8.1f} us  {kind}")
        return tot_f, tot_t


def generator_model(n, image_size, capacity=16, fmap_max=512,
                    noise_batch1=True, fused_resample=False):
    from stylex_tpu.models.generator import style_coord_dims

    m = Model()
    dims = style_coord_dims(image_size, capacity, fmap_max)
    init_c = dims[0][0]
    m.conv("initial_conv 4x4", n, 4, 4, init_c, init_c)
    s = 4
    for i, (cin, cout) in enumerate(dims):
        up = i != 0
        if up:
            if not fused_resample:
                m.mem(f"b{i} upsample x {s}->{2*s}",
                      n * (s * s + 4 * s * s) * cin)
            s *= 2
        nb = 1 if noise_batch1 else n
        m.matmul(f"b{i} to_noise1+2", 2 * nb * s * s, 1, cout)
        if not noise_batch1:
            # materialised per-chunk noise maps are re-read at the add
            m.mem(f"b{i} noise add reread", 2 * n * s * s * cout)
        if up and fused_resample:
            # polyphase upconv (ops/upconv.py): conv1 reads the COARSE grid
            # once and writes the fine grid once — the fine-grid input
            # round trip (upsample write + conv re-read) is gone. Same
            # FLOPs, 4x kernel bytes, 4*cout output-channel tiling.
            sc = s // 2
            flops = 2 * 9 * cin * cout * s * s * n
            kdim = 9 * cin
            lane_eff = (kdim / _pad(kdim, 128)) * (
                4 * cout / _pad(4 * cout, 128))
            byts = (n * sc * sc * cin + n * s * s * cout
                    + 9 * cin * 4 * cout) * BYTES
            t = max(flops / (MXU_PEAK * lane_eff), byts / HBM_PEAK)
            m.rows.append((f"b{i} up+conv1 {cin}->{cout}@{s}", flops, byts,
                           t, f"mxu eff={lane_eff:.2f} fused"))
        else:
            m.conv(f"b{i} conv1 {cin}->{cout}@{s}", n, s, s, cin, cout)
        m.conv(f"b{i} conv2 {cout}->{cout}@{s}", n, s, s, cout, cout)
        m.matmul(f"b{i} rgb 1x1", n * s * s, cout, 3)
        if i != len(dims) - 1:
            if fused_resample:
                # separable polyphase upsample+blur (ops/blur.py): one
                # coarse read + one fine write
                m.mem(f"b{i} rgb up+blur fused",
                      n * (s * s + 4 * s * s) * 3)
            else:
                # rgb bilinear up + 3-tap blur (3 channels, separable)
                m.mem(f"b{i} rgb upsample+blur", n * (4 * s * s) * 3 * 4)
    return m


def classifier_model(n, image_size):
    # torchvision MobileNetV2 plan
    plan = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
    m = Model()
    s = image_size // 2
    m.conv("stem 3->32 s2", n, image_size, image_size, 3, 32, stride=2)
    cin = 32
    for t, c, reps, stride in plan:
        for i in range(reps):
            st = stride if i == 0 else 1
            hidden = cin * t
            if t != 1:
                m.matmul(f"exp {cin}->{hidden}@{s}", n * s * s, cin, hidden)
            m.conv(f"dw {hidden}@{s} s{st}", n, s, s, hidden, hidden, dw=True,
                   stride=st)
            s //= st
            m.matmul(f"proj {hidden}->{c}@{s}", n * s * s, hidden, c)
            cin = c
    m.matmul("head 320->1280", n * s * s, 320, 1280)
    m.matmul("fc", n, 1280, 2)
    return m


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--coord-batch", type=int, default=616)
    args = p.parse_args()
    n, S = args.coord_batch, args.image_size

    print(f"AttFind flat sweep roofline @ {S}px, chunk {n}, bf16")
    g_old = generator_model(n, S, noise_batch1=False)
    f_old, t_old = g_old.report("generator (noise broadcast per chunk — r2)")
    g_new = generator_model(n, S, noise_batch1=True)
    f_gen, t_gen = g_new.report("generator (batch-1 noise — r3)")
    g_fused = generator_model(n, S, noise_batch1=True, fused_resample=True)
    f_gf, t_gf = g_fused.report("generator (fused polyphase resamplers — r3)")
    c = classifier_model(n, S)
    f_clf, t_clf = c.report("classifier (MobileNetV2)")

    tot_ff, tot_tf = f_gf + f_clf, t_gf + t_clf
    print(f"\n== sweep ceiling (r3 fused resamplers): {tot_tf*1e3:.3f} ms/chunk"
          f" -> {n/tot_tf:.0f} styles/s, MFU ceiling {tot_ff/tot_tf/MXU_PEAK:.3f}")
    tot_f, tot_t = f_gen + f_clf, t_gen + t_clf
    print(f"== sweep ceiling (r3 unfused): {tot_t*1e3:.3f} ms/chunk -> "
          f"{n/tot_t:.0f} styles/s, MFU ceiling {tot_f/tot_t/MXU_PEAK:.3f}")
    tot_f0, tot_t0 = f_old + f_clf, t_old + t_clf
    print(f"== sweep ceiling (r2 noise scheme): {tot_t0*1e3:.3f} ms/chunk -> "
          f"{n/tot_t0:.0f} styles/s, MFU ceiling {tot_f0/tot_t0/MXU_PEAK:.3f}")


if __name__ == "__main__":
    main()
