"""MNIST one-vs-all dataset (`MNIST_1vA`,
`/root/reference/stylex/stylex_train.py:495-517`).

Reads the raw IDX files (``train-images-idx3-ubyte`` /
``train-labels-idx1-ubyte``, optionally ``.gz``) from a local folder — this
container has no network egress, so unlike the reference there is no
auto-download; point ``folder`` at an existing MNIST copy. Targets are
binarised as ``label == digit`` (default 8) and images are resized to 32px,
replicated to 3 channels, matching the reference transform. Use
:func:`stylex_tpu.data.loader.balanced_class_weights` for the reference's
``WeightedRandomSampler`` oversampling (`stylex_train.py:1233-1239`).
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import numpy as np

__all__ = ["MNIST1vA", "load_idx_images", "load_idx_labels", "SyntheticImageDataset"]


def _open_maybe_gz(path: Path):
    if path.exists():
        return open(path, "rb")
    gz = path.with_name(path.name + ".gz")
    if gz.exists():
        return gzip.open(gz, "rb")
    raise FileNotFoundError(f"{path}(.gz) not found — download MNIST IDX files there")


def load_idx_images(path: Path) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        assert magic == 2051, f"bad magic {magic}"
        data = np.frombuffer(f.read(n * rows * cols), np.uint8)
    return data.reshape(n, rows, cols)


def load_idx_labels(path: Path) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        assert magic == 2049, f"bad magic {magic}"
        return np.frombuffer(f.read(n), np.uint8)


class MNIST1vA:
    """Binary MNIST: positive class = ``digit``; 32px, 3-channel."""

    image_size = 32

    def __init__(self, folder: str = "./", digit: int = 8, train: bool = True):
        prefix = "train" if train else "t10k"
        folder_p = Path(folder)
        self.images = load_idx_images(folder_p / f"{prefix}-images-idx3-ubyte")
        labels = load_idx_labels(folder_p / f"{prefix}-labels-idx1-ubyte")
        self.targets = (labels == digit).astype(np.int64)

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int) -> np.ndarray:
        img = self.images[index].astype(np.float32) / 255.0  # (28, 28)
        # Resize(32) == pad-free bilinear upscale of the short side.
        import numpy as _np

        # bilinear 28 -> 32 with half-pixel centers
        src = img
        y = (_np.arange(32) + 0.5) * 28 / 32 - 0.5
        x = (_np.arange(32) + 0.5) * 28 / 32 - 0.5
        y0 = _np.clip(_np.floor(y).astype(int), 0, 27)
        x0 = _np.clip(_np.floor(x).astype(int), 0, 27)
        y1 = _np.clip(y0 + 1, 0, 27)
        x1 = _np.clip(x0 + 1, 0, 27)
        wy = _np.clip(y - y0, 0, 1)[:, None]
        wx = _np.clip(x - x0, 0, 1)[None, :]
        out = (
            src[_np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
            + src[_np.ix_(y1, x0)] * wy * (1 - wx)
            + src[_np.ix_(y0, x1)] * (1 - wy) * wx
            + src[_np.ix_(y1, x1)] * wy * wx
        )
        return np.repeat(out[..., None], 3, axis=-1).astype(np.float32)

    def label(self, index: int) -> int:
        return int(self.targets[index])


class SyntheticImageDataset:
    """Deterministic synthetic image dataset for tests / smoke training
    (fills the role of MNIST when no data is on disk)."""

    def __init__(self, n: int, image_size: int, channels: int = 3, seed: int = 0):
        self.n = n
        self.image_size = image_size
        self.channels = channels
        self.seed = seed

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, index: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed * 100003 + index)
        base = rng.rand(4, 4, self.channels).astype(np.float32)
        # smooth upscale so images have structure
        reps = self.image_size // 4
        img = np.kron(base, np.ones((reps, reps, 1), np.float32))
        return np.clip(img + rng.rand(*img.shape).astype(np.float32) * 0.1, 0.0, 1.0)
