"""Data-layer tests: folder dataset, loaders, labeled adapters, splits."""

import csv
import numpy as np
import pytest
from PIL import Image

from stylex_tpu.data import (
    CelebAAttribute,
    FFHQGender,
    FolderDataset,
    ImageFolderDataset,
    SampleLoader,
    StepBatchLoader,
    SyntheticImageDataset,
    balanced_class_weights,
    plant_village_splits,
    prepare_plant_village,
    seeded_split,
)


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(10):
        Image.fromarray(rng.randint(0, 255, (40, 48, 3), np.uint8)).save(d / f"{i}.png")
    (d / "sub").mkdir()
    Image.fromarray(rng.randint(0, 255, (30, 30), np.uint8), mode="L").save(d / "sub" / "g.jpg")
    return d


def test_folder_dataset_recursive_and_greyscale(image_folder):
    ds = FolderDataset(str(image_folder), 16)
    assert len(ds) == 11
    for i in range(len(ds)):
        img = ds[i]
        assert img.shape == (16, 16, 3)
        assert img.dtype == np.float32


def test_folder_dataset_aug_path(image_folder):
    ds = FolderDataset(str(image_folder), 16, aug_prob=1.0, seed=3)
    img = ds[0]
    assert img.shape == (16, 16, 3)


def test_step_batch_loader_shapes(image_folder):
    ds = FolderDataset(str(image_folder), 16)
    loader = StepBatchLoader(ds, batch_size=2, accum=3, seed=0, num_workers=2)
    batch = next(loader)
    assert set(batch) == {"d_real", "d_enc", "g_imgs"}
    for v in batch.values():
        assert v.shape == (3, 2, 16, 16, 3)
    loader.close()


def test_balanced_class_weights():
    labels = [0] * 9 + [1]
    w = balanced_class_weights(labels, 2)
    assert w[-1] / w[0] == pytest.approx(9.0)
    ds = SyntheticImageDataset(16, 8)
    loader = SampleLoader(ds, 4, weights=np.ones(16))
    assert next(loader).shape == (4, 8, 8, 3)
    loader.close()


def test_seeded_split_deterministic():
    a = seeded_split(100, [0.7, 0.15, 0.15], seed=42)
    b = seeded_split(100, [0.7, 0.15, 0.15], seed=42)
    assert [len(x) for x in a] == [70, 15, 15]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert len(np.intersect1d(a[0], a[1])) == 0


def test_celeba_adapter(tmp_path):
    root = tmp_path
    imgdir = root / "img_align_celeba"
    imgdir.mkdir()
    rng = np.random.RandomState(1)
    rows = []
    for i in range(6):
        name = f"{i:06d}.jpg"
        Image.fromarray(rng.randint(0, 255, (32, 28, 3), np.uint8)).save(imgdir / name)
        rows.append({"image_id": name, "Male": 1 if i % 2 else -1})
    with open(root / "list_attr_celeba.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image_id", "Male"])
        w.writeheader()
        w.writerows(rows)
    ds = CelebAAttribute(str(root), image_size=16)
    assert len(ds) == 6
    img, label = ds[1]
    assert img.shape == (16, 16, 3) and label == 1
    assert ds.label(0) == 0
    # round(1.5) banker's-rounds to 2; the first split absorbs the diff
    # (matching the reference's `round` + adjust scheme).
    train, valid, test = ds.splits(fractions=(0.5, 0.25, 0.25))
    assert len(train) + len(valid) + len(test) == 6


def test_plant_village_prepare_and_splits(tmp_path):
    src = tmp_path / "archive" / "Plant_leave_diseases_dataset_without_augmentation"
    rng = np.random.RandomState(2)
    for cls in ("Tomato_healthy", "Tomato_blight"):
        (src / cls).mkdir(parents=True)
        for i in range(5):
            Image.fromarray(rng.randint(0, 255, (20, 20, 3), np.uint8)).save(src / cls / f"{i}.jpg")
    out = prepare_plant_village(str(tmp_path / "archive"), str(tmp_path / "pv"))
    ds = ImageFolderDataset(out, 16)
    assert ds.classes == ["healthy", "sick"]
    assert len(ds) == 10
    train, valid, test = plant_village_splits(out, 16)
    assert len(train) == 7 and len(valid) == 2 and len(test) == 1
    img, label = train[0]
    assert img.shape == (16, 16, 3) and label in (0, 1)


def test_ffhq_adapter(tmp_path):
    root = tmp_path
    resized = root / "flickrfaceshq-dataset-nvidia-resized-256px" / "resized"
    resized.mkdir(parents=True)
    rng = np.random.RandomState(3)
    rows = []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (24, 24, 3), np.uint8)).save(resized / f"{i:05d}.jpg")
        rows.append({"image_number": i, "gender": "male" if i % 2 == 0 else "female"})
    with open(root / "ffhq_aging_labels.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image_number", "gender"])
        w.writeheader()
        w.writerows(rows)
    ds = FFHQGender(str(root), image_size=16)
    assert len(ds) == 4
    img, label = ds[1]
    assert img.shape == (16, 16, 3) and label == 1


def test_loader_uint8_transfer_roundtrip(image_folder):
    """The loader ships uint8 (4x less host->device traffic); as_float01
    must restore [0,1] floats within quantization error, and quantize=False
    must keep the old float32 contract."""
    from stylex_tpu.data.loader import as_float01

    ds = FolderDataset(str(image_folder), 16)
    q = SampleLoader(ds, 4, seed=0, num_workers=2)
    f = SampleLoader(ds, 4, seed=0, num_workers=2, quantize=False)
    bq, bf = next(q), next(f)
    q.close(), f.close()
    assert bq.dtype == np.uint8 and bf.dtype == np.float32
    assert np.abs(as_float01(bq) - bf).max() <= 0.5 / 255 + 1e-7
    assert as_float01(bf) is bf


@pytest.mark.slow
def test_train_step_accepts_uint8_batch():
    """A quantized uint8 batch must train identically to its dequantized
    float batch (on-device normalisation in train_step)."""
    import jax
    import jax.numpy as jnp

    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.classifiers import build_classifier
    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=1, aug_prob=0.0)
    modules = build_stylex(cfg)
    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx))

    rng = np.random.default_rng(0)
    u8 = {k: rng.integers(0, 256, (1, 2, 16, 16, 3), dtype=np.uint8)
          for k in ("d_real", "d_enc", "g_imgs")}
    f32 = {k: (v.astype(np.float32) / 255.0) for k, v in u8.items()}
    _, m_u8 = step(state, {k: jnp.asarray(v) for k, v in u8.items()}, jax.random.PRNGKey(3))
    _, m_f32 = step(state, {k: jnp.asarray(v) for k, v in f32.items()}, jax.random.PRNGKey(3))
    for k in m_f32:
        np.testing.assert_allclose(float(m_u8[k]), float(m_f32[k]), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_step_accepts_uint8_batch_bf16():
    """The uint8 path must also work under the bf16 step (regression: the
    dequantised images must stay f32 so the GP lax.cond branches agree)."""
    import jax
    import jax.numpy as jnp

    from stylex_tpu.config import ModelConfig, TrainConfig
    from stylex_tpu.models import build_stylex
    from stylex_tpu.models.classifiers import build_classifier
    from stylex_tpu.models.lpips import init_lpips_params
    from stylex_tpu.train.state import create_train_state
    from stylex_tpu.train.steps import make_train_step

    cfg = ModelConfig(image_size=16, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=1, aug_prob=0.0,
                     compute_dtype="bfloat16")
    modules = build_stylex(cfg)
    state, g_tx, d_tx = create_train_state(jax.random.PRNGKey(0), modules, cfg, tc)
    clf = build_classifier("mobilenet", cfg.image_size)
    lp = init_lpips_params(jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(modules, clf.classify_images, lp, cfg, tc, g_tx, d_tx))

    rng = np.random.default_rng(0)
    u8 = {k: jnp.asarray(rng.integers(0, 256, (1, 2, 16, 16, 3), dtype=np.uint8))
          for k in ("d_real", "d_enc", "g_imgs")}
    _, metrics = step(state, u8, jax.random.PRNGKey(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
