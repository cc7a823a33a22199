"""Deterministic synthetic labeled image folder for training campaigns.

This container has no network egress, so the reference's datasets
(PlantVillage / FFHQ / CelebA — `/root/reference/data/*/download_*.ipynb`)
cannot be fetched. This script procedurally generates a PlantVillage-like
two-class folder (``healthy`` / ``sick`` leaves) with enough intra-class
variation (pose, size, hue, background, lesions) that (a) a classifier can
learn the label and (b) a GAN has real structure to model. Layout is
torchvision ImageFolder style (``root/<class>/*.png``), which both
``stylex_tpu.data.labeled.ImageFolderDataset`` (classifier pretraining) and
``stylex_tpu.data.dataset.FolderDataset`` (GAN training) consume.

Fully deterministic: image i of class c depends only on (seed, c, i).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def _leaf_mask(size: int, rng: np.random.RandomState) -> np.ndarray:
    """Rotated super-ellipse with lobed edges — a 'leaf' alpha mask."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cx = size * (0.5 + 0.12 * rng.uniform(-1, 1))
    cy = size * (0.5 + 0.12 * rng.uniform(-1, 1))
    theta = rng.uniform(0, np.pi)
    a = size * rng.uniform(0.26, 0.40)  # semi-major
    b = a * rng.uniform(0.45, 0.75)  # semi-minor
    ct, st = np.cos(theta), np.sin(theta)
    u = (xx - cx) * ct + (yy - cy) * st
    v = -(xx - cx) * st + (yy - cy) * ct
    # lobed boundary: radius modulated by angular harmonics
    ang = np.arctan2(v / b, u / a)
    lobes = 1.0 + 0.08 * np.sin(ang * rng.randint(4, 8) + rng.uniform(0, 6.28))
    r = np.sqrt((u / a) ** 2 + (v / b) ** 2) / lobes
    return np.clip(1.4 * (1.0 - r), 0.0, 1.0) ** 0.7, (u, v, a, b)


def _vein_texture(u: np.ndarray, v: np.ndarray, a: float, b: float,
                  rng: np.random.RandomState) -> np.ndarray:
    """Midrib + lateral veins in leaf-local coordinates."""
    mid = np.exp(-(v / (0.02 * b + 1e-6)) ** 2)
    lat = 0.5 * np.exp(-(np.sin(u / a * rng.uniform(8, 14) + v / b) ** 2) / 0.08)
    return np.clip(mid + lat, 0, 1)


def render_leaf(size: int, label: int, rng: np.random.RandomState) -> np.ndarray:
    # soil/background: brownish-grey gradient + noise
    g0 = rng.uniform(0.10, 0.30)
    grad = np.linspace(0, rng.uniform(-0.08, 0.08), size, dtype=np.float32)
    bg = np.stack(
        [
            g0 * rng.uniform(0.9, 1.2) + grad[:, None] + 0.04 * rng.randn(size, size)
            for _ in range(3)
        ],
        -1,
    ).astype(np.float32)

    mask, (u, v, a, b) = _leaf_mask(size, rng)
    veins = _vein_texture(u, v, a, b, rng)

    # healthy green with per-leaf hue jitter
    green = np.array(
        [0.15 + 0.10 * rng.uniform(-1, 1), 0.55 + 0.15 * rng.uniform(-1, 1),
         0.12 + 0.08 * rng.uniform(-1, 1)],
        np.float32,
    )
    leaf = green[None, None, :] * (0.75 + 0.25 * veins[..., None])
    # gentle shading along the major axis
    leaf *= (1.0 + 0.15 * (u / (a + 1e-6)))[..., None]

    if label == 1:  # sick: necrotic brown/yellow lesions
        n_spots = rng.randint(3, 9)
        lesion = np.zeros((size, size), np.float32)
        for _ in range(n_spots):
            # place lesions inside the leaf (rejection-free: sample in leaf frame)
            lu = rng.uniform(-0.8, 0.8) * a
            lv = rng.uniform(-0.8, 0.8) * b
            rad = size * rng.uniform(0.03, 0.09)
            d2 = (u - lu) ** 2 + (v - lv) ** 2
            lesion = np.maximum(lesion, np.exp(-d2 / (rad ** 2)))
        lesion = np.clip(lesion * mask, 0, 1)
        brown = np.array([0.45, 0.30, 0.08], np.float32)
        yellow_halo = np.array([0.65, 0.60, 0.10], np.float32)
        halo = np.clip(lesion * 1.8, 0, 1) - lesion
        leaf = (
            leaf * (1 - lesion[..., None] - 0.6 * halo[..., None])
            + brown[None, None, :] * lesion[..., None]
            + yellow_halo[None, None, :] * 0.6 * halo[..., None]
        )

    img = bg * (1 - mask[..., None]) + leaf * mask[..., None]
    img += 0.015 * rng.randn(size, size, 3)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/data/synth64")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--per-class", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    out = Path(args.out)
    for label, cname in enumerate(("healthy", "sick")):
        d = out / cname
        d.mkdir(parents=True, exist_ok=True)
        for i in range(args.per_class):
            rng = np.random.RandomState((args.seed * 1_000_003 + label * 65_537 + i) % 2**31)
            img = render_leaf(args.size, label, rng)
            Image.fromarray(img).save(d / f"{i:05d}.png")
        print(f"{cname}: {args.per_class} images -> {d}")


if __name__ == "__main__":
    main()
