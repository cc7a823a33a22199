"""Native pixel-pipeline tests: build, PIL parity, loader integration."""

import numpy as np
import pytest
from PIL import Image

from stylex_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build unavailable")


def _pil_reference(arr, out_size, crop):
    img = Image.fromarray(arr)
    img = img.resize((out_size[1], out_size[0]), Image.BILINEAR)
    w, h = img.size
    left = (w - crop) // 2
    top = (h - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    return np.asarray(img, np.float32) / 255.0


@pytest.mark.parametrize("in_shape,out_size,crop", [
    ((100, 80, 3), (64, 51), 48),   # downscale
    ((40, 60, 3), (96, 144), 96),   # upscale
    ((64, 64, 3), (64, 64), 64),    # identity resize
])
def test_resize_crop_matches_pil(in_shape, out_size, crop):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=in_shape, dtype=np.uint8)
    want = _pil_reference(arr, out_size, crop)
    got = native.resize_crop_normalize(arr, out_size, (crop, crop))
    # PIL uses 8-bit fixed-point filter coefficients; allow 2/255.
    assert np.abs(got - want).max() <= 2.5 / 255.0


def test_normalize_and_hflip():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    got = native.normalize_u8(arr, mean, std, hflip=True)
    want = (arr[:, ::-1].astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_writes_into_preallocated_batch_row():
    rng = np.random.RandomState(2)
    arr = rng.randint(0, 256, size=(50, 70, 3), dtype=np.uint8)
    batch = np.zeros((4, 32, 32, 3), np.float32)
    out = native.resize_crop_normalize(arr, (32, 44), (32, 32), out=batch[1])
    assert out.base is batch or out is batch[1] or np.shares_memory(out, batch)
    assert batch[1].max() > 0 and batch[0].max() == 0


def test_loader_path_uses_native(tmp_path):
    from stylex_tpu.data.dataset import load_and_transform

    rng = np.random.RandomState(3)
    p = tmp_path / "img.png"
    Image.fromarray(rng.randint(0, 256, size=(70, 90, 3), dtype=np.uint8)).save(p)
    out = load_and_transform(p, 32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
