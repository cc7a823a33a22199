"""Classifier-training CLI (`train_mobilenet_classifier.py` equivalent).

    python -m stylex_tpu.train_classifier --dataset FFHQ-Aging \\
        --data-root data/Kaggle_FFHQ_Resized_256px --epochs 20 --lr 1e-4

Mirrors the reference argparse surface
(`/root/reference/stylex/train_mobilenet_classifier.py:279-306`) and also
exposes the CelebA/ResNet progressive-unfreeze recipe from
``classifier_training_celeba.ipynb`` via ``--model resnet --progressive``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def labeled_batches(view, batch_size: int, seed: int = 42, shuffle: bool = True):
    """Yield (images, labels) numpy batches from a labeled dataset view.

    Images ship as uint8 (4x less host->device traffic than float32 —
    decisive at 256px); ``imagenet_normalize`` dequantises on device.
    """
    n = len(view)
    order = np.random.RandomState(seed).permutation(n) if shuffle else np.arange(n)
    # include the tail batch: torch's DataLoader default (drop_last=False,
    # `train_mobilenet_classifier.py`) — dropping it silently excludes up to
    # batch_size-1 samples from every epoch AND yields nothing at all for
    # splits smaller than batch_size (accuracy would read 0.0)
    for start in range(0, n, batch_size):
        idx = order[start : start + batch_size]
        samples = [view[int(i)] for i in idx]
        images = np.stack([s[0] for s in samples])
        if images.dtype != np.uint8:
            images = np.clip(images * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
        labels = np.asarray([s[1] for s in samples], np.int32)
        yield images, labels


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Train a StylEx classifier")
    parser.add_argument("--dataset", default="FFHQ-Aging",
                        choices=["FFHQ-Aging", "CelebA", "PlantVillage", "synthetic"])
    parser.add_argument("--data-root", default="data/Kaggle_FFHQ_Resized_256px")
    parser.add_argument("--model", default="mobilenet", choices=["mobilenet", "resnet"])
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--amount-frozen-layers", type=int, default=15)
    parser.add_argument("--freeze-all-layers", action="store_true")
    parser.add_argument("--progressive", action="store_true",
                        help="ResNet progressive unfreeze (fc -> +layer4 -> +layer3)")
    parser.add_argument("--checkpoint-name", default="classifier.msgpack")
    parser.add_argument("--saved-models-dir", default="saved_models")
    parser.add_argument("--results-dir", default="classifier_results")
    parser.add_argument("--tensorboard-dir", default="./tboard_logs")
    args = parser.parse_args(argv)

    from stylex_tpu.train.classifier_training import (
        ClassifierTrainer,
        mobilenet_freeze_mask,
        resnet_progressive_stages,
    )

    if args.dataset == "FFHQ-Aging":
        from stylex_tpu.data.labeled import FFHQGender

        ds = FFHQGender(args.data_root, image_size=args.image_size)
        train_v, valid_v, test_v = ds.splits(seed=args.seed)
    elif args.dataset == "CelebA":
        from stylex_tpu.data.labeled import CelebAAttribute

        ds = CelebAAttribute(args.data_root, image_size=args.image_size)
        train_v, valid_v, test_v = ds.splits(seed=args.seed)
    elif args.dataset == "PlantVillage":
        from stylex_tpu.data.labeled import plant_village_splits

        train_v, valid_v, test_v = plant_village_splits(args.data_root, args.image_size, args.seed)
    else:  # synthetic smoke data
        from stylex_tpu.data.mnist import SyntheticImageDataset

        class _Lab:
            def __init__(self, n, seed):
                self.ds = SyntheticImageDataset(n, args.image_size, seed=seed)

            def __len__(self):
                return len(self.ds)

            def __getitem__(self, i):
                return self.ds[i], i % 2

        train_v, valid_v, test_v = _Lab(64, 0), _Lab(16, 1), _Lab(16, 2)

    trainer = ClassifierTrainer(args.model, lr=args.lr, seed=args.seed,
                                tensorboard_dir=args.tensorboard_dir)
    trainer.init(args.image_size)

    stages = None
    if args.model == "resnet" and args.progressive:
        stages = resnet_progressive_stages()
    elif args.model == "mobilenet":
        trainer.set_trainable(mask=mobilenet_freeze_mask(
            trainer.variables["params"], args.amount_frozen_layers, args.freeze_all_layers
        ))

    # train loader reshuffles per epoch (reference DataLoader shuffle=True);
    # eval loaders keep the fixed seed
    mk = lambda view: (
        lambda epoch=0: labeled_batches(view, args.batch_size, args.seed + epoch)
    )
    ckpt = os.path.join(args.saved_models_dir, args.checkpoint_name)
    history = trainer.fit(mk(train_v), mk(valid_v), args.epochs, ckpt, stages=stages)
    results = trainer.test(
        mk(test_v),
        results_path=os.path.join(args.results_dir, args.checkpoint_name + ".json"),
    )
    print({**results, "best_val_accuracy": history["best_val_accuracy"]})


if __name__ == "__main__":
    main()
