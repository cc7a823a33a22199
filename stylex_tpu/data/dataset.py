"""Folder image dataset with reference-faithful preprocessing.

Host side: PIL decode + resize/crop (the reference's torchvision pipeline,
`/root/reference/stylex/stylex_train.py:520-547`), NHWC float32 output.
The transform chain matches:

  convert RGB(A) -> resize-to-minimum -> Resize(short side = image_size)
  -> RandomApply(aug_prob, RandomResizedCrop(scale 0.5-1.0, ratio
  0.98-1.02), else CenterCrop) -> [0,1] floats -> greyscale expansion.

Device-side augmentation (DiffAugment/hflip) lives in
:mod:`stylex_tpu.ops.diffaug`; this module is deliberately decode-only so
the TPU never waits on Python for anything but raw pixels.
"""

from __future__ import annotations

import math
import random as pyrandom
from pathlib import Path
from typing import List, Optional

import numpy as np

__all__ = ["FolderDataset", "list_images", "load_and_transform", "expand_greyscale"]

EXTS = ("jpg", "jpeg", "png")


def list_images(folder: str) -> List[Path]:
    paths = [p for ext in EXTS for p in Path(folder).glob(f"**/*.{ext}")]
    if not paths:
        raise ValueError(f"No images were found in {folder} for training")
    return sorted(paths)


def expand_greyscale(arr: np.ndarray, transparent: bool = False) -> np.ndarray:
    """1/2-channel -> 3(4)-channel (`expand_greyscale`,
    `stylex_train.py:454-477`)."""
    target = 4 if transparent else 3
    c = arr.shape[-1]
    if c == target:
        return arr
    if c == 1:
        color = np.repeat(arr, 3, axis=-1)
        alpha = None
    elif c == 2:
        color = np.repeat(arr[..., :1], 3, axis=-1)
        alpha = arr[..., 1:]
    else:
        raise ValueError(f"image with invalid number of channels given {c}")
    if transparent:
        if alpha is None:
            alpha = np.ones_like(arr[..., :1])
        return np.concatenate([color, alpha], axis=-1)
    return color


def _resize_short_side(img, size: int):
    from PIL import Image

    w, h = img.size
    if min(w, h) == size:
        return img
    if w < h:
        nw, nh = size, max(1, round(h * size / w))
    else:
        nw, nh = max(1, round(w * size / h)), size
    return img.resize((nw, nh), Image.BILINEAR)


def _center_crop(img, size: int):
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def _random_resized_crop(img, size: int, rng: pyrandom.Random,
                         scale=(0.5, 1.0), ratio=(0.98, 1.02)):
    """torchvision RandomResizedCrop sampling (10 tries then center fallback)."""
    from PIL import Image

    w, h = img.size
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            return img.resize((size, size), Image.BILINEAR, box=(left, top, left + cw, top + ch))
    return _center_crop(_resize_short_side(img, size), size)


def _short_side_dims(w: int, h: int, size: int):
    if w < h:
        return size, max(1, round(h * size / w))
    return max(1, round(w * size / h)), size


def load_and_transform(
    path, image_size: int, transparent: bool = False, aug_prob: float = 0.0,
    rng: Optional[pyrandom.Random] = None, out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode one image to (image_size, image_size, C) float32 in [0,1].

    The post-decode resize/crop/normalise runs through the fused C++
    pipeline (:mod:`stylex_tpu.native`) when built — one pass, writing
    directly into ``out`` (a batch row) with no intermediates; the PIL path
    is the fallback and the augmentation (RandomResizedCrop) branch.
    """
    from PIL import Image

    rng = rng or pyrandom
    img = Image.open(path)
    img = img.convert("RGBA" if transparent else "RGB")
    use_aug = aug_prob > 0 and rng.random() < aug_prob

    if not use_aug:
        from stylex_tpu import native

        if native.available():
            nw, nh = _short_side_dims(*img.size, image_size)
            return native.resize_crop_normalize(
                np.asarray(img), (nh, nw), (image_size, image_size), out=out
            )

    # resize_to_minimum_size (`stylex_train.py:480-483`)
    if max(img.size) < image_size:
        img = _resize_short_side(img, image_size)
    img = _resize_short_side(img, image_size)
    if use_aug:
        img = _random_resized_crop(img, image_size, rng)
    else:
        img = _center_crop(img, image_size)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return expand_greyscale(arr, transparent)


class FolderDataset:
    """Recursive jpg/jpeg/png dataset (`Dataset`, `stylex_train.py:520-547`)."""

    def __init__(self, folder: str, image_size: int, transparent: bool = False,
                 aug_prob: float = 0.0, seed: int = 0):
        self.paths = list_images(folder)
        self.image_size = image_size
        self.transparent = transparent
        self.aug_prob = aug_prob
        self._rng = pyrandom.Random(seed)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> np.ndarray:
        return load_and_transform(
            self.paths[index], self.image_size, self.transparent, self.aug_prob, self._rng
        )
