from stylex_tpu.data.dataset import FolderDataset, list_images, load_and_transform
from stylex_tpu.data.loader import StepBatchLoader, SampleLoader, balanced_class_weights
from stylex_tpu.data.mnist import MNIST1vA, SyntheticImageDataset
from stylex_tpu.data.labeled import (
    FFHQGender,
    CelebAAttribute,
    ImageFolderDataset,
    LabeledView,
    seeded_split,
    plant_village_splits,
    prepare_plant_village,
)

__all__ = [
    "FolderDataset",
    "list_images",
    "load_and_transform",
    "StepBatchLoader",
    "SampleLoader",
    "balanced_class_weights",
    "MNIST1vA",
    "SyntheticImageDataset",
    "FFHQGender",
    "CelebAAttribute",
    "ImageFolderDataset",
    "LabeledView",
    "seeded_split",
    "plant_village_splits",
    "prepare_plant_village",
]
