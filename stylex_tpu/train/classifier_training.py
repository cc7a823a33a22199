"""Classifier pretraining — L6 of the reference stack (SURVEY §2.13).

Covers both reference workflows:

* ``train_mobilenet_classifier.py``: MobileNetV2 with a configurable number
  of frozen feature stages (or all frozen), Adam + cross-entropy, best-val
  checkpointing, seeded test evaluation, accuracy JSON
  (`/root/reference/stylex/train_mobilenet_classifier.py:58-213,216-238,
  309-314`), TensorBoard scalars Loss/train + Accuracy/{train,validation},
* ``classifier_training_celeba.ipynb``: ResNet-18 with **progressive
  unfreezing** — fc only, then +layer4, then +layer3, one epoch per stage
  (cells 11-13).

TPU-shaped implementation: one jitted ``train_step``/``eval_step`` pair with
the freeze schedule expressed as a gradient mask (``optax.masked`` zeroing
frozen subtrees) — changing the unfreeze stage swaps the mask, not the
program. BatchNorm runs in train mode with running-stat updates, matching
torch fine-tuning semantics.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stylex_tpu.models.classifiers import MobileNetV2, ResNet18, imagenet_normalize

__all__ = [
    "ClassifierTrainer",
    "mobilenet_freeze_mask",
    "resnet_progressive_stages",
    "cross_entropy_loss",
    "accuracy",
]


def cross_entropy_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    return (jnp.argmax(logits, -1) == labels).mean()


# MobileNetV2 feature-stage -> our block names. torchvision features[0] is
# the stem, features[1..17] are inverted residuals, features[18] the head.
def mobilenet_freeze_mask(params: Dict[str, Any], amount_frozen_layers: int = 15,
                          freeze_all: bool = False) -> Dict[str, Any]:
    """True = trainable. Mirrors `load_mobilenet` freezing
    (`train_mobilenet_classifier.py:216-238`): freeze ``features[0..N-1]``;
    with ``freeze_all`` only the replaced classifier head trains."""

    def module_trainable(name: str) -> bool:
        if freeze_all:
            return name == "classifier"
        if name == "stem":
            return amount_frozen_layers < 1
        if name.startswith("block"):
            feat_index = int(name[5:]) + 1
            return feat_index >= amount_frozen_layers
        if name == "head":
            return 0 <= amount_frozen_layers <= 18
        return True  # classifier

    return {
        name: jax.tree.map(lambda _: module_trainable(name), sub)
        for name, sub in params.items()
    }


def resnet_progressive_stages() -> List[Callable[[str], bool]]:
    """The CelebA notebook's unfreeze schedule (cells 11-13): stage 0 trains
    fc only; stage 1 adds layer4; stage 2 adds layer3."""
    return [
        lambda name: name == "fc",
        lambda name: name == "fc" or name.startswith("layer4"),
        lambda name: name == "fc" or name.startswith("layer4") or name.startswith("layer3"),
    ]


class ClassifierTrainer:
    """Train/evaluate a flax classifier with freeze schedules.

    ``loader`` iterables yield ``(images_hwc01, labels)`` numpy batches.
    """

    def __init__(self, kind: str = "mobilenet", num_classes: int = 2, lr: float = 1e-4,
                 seed: int = 42, tensorboard_dir: Optional[str] = None):
        self.kind = kind
        self.model = (MobileNetV2 if kind == "mobilenet" else ResNet18)(num_classes=num_classes)
        self.lr = lr
        self.rng = jax.random.PRNGKey(seed)
        self.variables = None
        self.opt_state = None
        self._trainable = None
        self._tx = None
        self._writer = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(tensorboard_dir)
            except Exception:
                pass

    # ------------------------------------------------------------------ setup
    def init(self, image_size: int, variables: Optional[Dict[str, Any]] = None) -> None:
        if variables is not None:
            self.variables = variables
        else:
            dummy = jnp.zeros((1, image_size, image_size, 3))
            self.variables = self.model.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                dummy, train=True,
            )

    def set_trainable(self, mask_fn: Optional[Callable[[str], bool]] = None,
                      mask: Optional[Dict[str, Any]] = None) -> None:
        """Freeze schedule as an optax mask; resets optimizer slots (matching
        the notebook, which builds a new optimizer per stage)."""
        params = self.variables["params"]
        if mask is None:
            if mask_fn is None:
                mask = jax.tree.map(lambda _: True, params)
            else:
                mask = {
                    name: jax.tree.map(lambda _: mask_fn(name), sub)
                    for name, sub in params.items()
                }
        self._trainable = mask
        self._tx = optax.masked(optax.adam(self.lr), mask)
        self.opt_state = self._tx.init(params)
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    def _build_train_step(self):
        model, tx, mask = self.model, self._tx, self._trainable

        @jax.jit
        def step(variables, opt_state, images, labels, rng):
            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    imagenet_normalize(images), train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                )
                return cross_entropy_loss(out, labels), (out, updates["batch_stats"])

            (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"]
            )
            # zero grads on frozen leaves so masked adam slots stay inert
            grads = jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
            updates, opt_state = tx.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            return {"params": params, "batch_stats": new_stats}, opt_state, loss, accuracy(logits, labels)

        return step

    def _build_eval_step(self):
        model = self.model

        @jax.jit
        def step(variables, images, labels):
            logits = model.apply(variables, imagenet_normalize(images), train=False)
            return jnp.sum(jnp.argmax(logits, -1) == labels), logits

        return step

    # ------------------------------------------------------------------ loops
    def train_epoch(self, loader: Iterable, epoch: int = 0, log_every: int = 20) -> float:
        losses = []
        for i, (images, labels) in enumerate(loader):
            self.rng, k = jax.random.split(self.rng)
            self.variables, self.opt_state, loss, acc = self._train_step(
                self.variables, self.opt_state, jnp.asarray(images), jnp.asarray(labels), k
            )
            losses.append(float(loss))
            if self._writer is not None:
                self._writer.add_scalar("Loss/train", float(loss), epoch * 10_000 + i)
            if i % log_every == 0:
                print(f"\repoch {epoch}: batch {i}, running loss {np.mean(losses):.4f}",
                      end="", flush=True)
        print()
        return float(np.mean(losses)) if losses else float("nan")

    def evaluate(self, loader: Iterable) -> float:
        """Accuracy over a loader (`evaluate_model`,
        `train_mobilenet_classifier.py:152-177`)."""
        correct = 0
        total = 0
        for images, labels in loader:
            c, _ = self._eval_step(self.variables, jnp.asarray(images), jnp.asarray(labels))
            correct += int(c)
            total += len(labels)
        return correct / max(total, 1)

    def fit(self, train_loader_fn, valid_loader_fn, epochs: int, checkpoint_path: str,
            stages: Optional[Sequence[Callable[[str], bool]]] = None) -> Dict[str, float]:
        """Best-val training loop (`train_model`,
        `train_mobilenet_classifier.py:58-149`); optional progressive
        unfreeze stages, one stage per epoch (CelebA notebook cells 11-13).

        ``train_loader_fn`` may accept the epoch index — used to reshuffle
        per epoch, the reference's ``DataLoader(shuffle=True)`` behavior;
        zero-arg callables work unchanged."""
        # -1 so the first epoch always checkpoints: an all-zero validation
        # accuracy would otherwise never write the file self.load() reads
        best_val = -1.0
        history = {}
        for epoch in range(epochs):
            if stages is not None:
                self.set_trainable(stages[min(epoch, len(stages) - 1)])
            elif self._tx is None:
                self.set_trainable()
            t0 = time.time()

            def _train_loader():
                try:
                    return train_loader_fn(epoch)
                except TypeError:
                    return train_loader_fn()

            train_loss = self.train_epoch(_train_loader(), epoch)
            train_acc = self.evaluate(_train_loader())
            val_acc = self.evaluate(valid_loader_fn())
            print(f"epoch {epoch}: loss {train_loss:.4f}, train acc {train_acc:.4f}, "
                  f"val acc {val_acc:.4f} ({(time.time() - t0) / 60:.2f} min)")
            if self._writer is not None:
                self._writer.add_scalar("Accuracy/train", train_acc, epoch)
                self._writer.add_scalar("Accuracy/validation", val_acc, epoch)
            if val_acc > best_val:
                best_val = val_acc
                self.save(checkpoint_path)
            history[f"epoch_{epoch}"] = {"loss": train_loss, "train_acc": train_acc, "val_acc": val_acc}
        if best_val >= 0.0:  # at least one epoch ran, so the file exists
            self.load(checkpoint_path)
        history["best_val_accuracy"] = max(best_val, 0.0)
        return history

    def test(self, test_loader_fn, results_path: Optional[str] = None) -> Dict[str, float]:
        """Seeded test evaluation + results JSON (`test_model`,
        `train_mobilenet_classifier.py:180-213,309-314`)."""
        acc = self.evaluate(test_loader_fn())
        results = {"test_accuracy": acc}
        if results_path:
            Path(results_path).parent.mkdir(parents=True, exist_ok=True)
            Path(results_path).write_text(json.dumps(results, indent=2))
        return results

    def confusion_matrix(self, loader: Iterable, num_classes: int = 2) -> np.ndarray:
        """Cross-dataset confusion matrix (CelebA notebook cells 26-34)."""
        cm = np.zeros((num_classes, num_classes), np.int64)
        for images, labels in loader:
            _, logits = self._eval_step(self.variables, jnp.asarray(images), jnp.asarray(labels))
            preds = np.argmax(np.asarray(logits), -1)
            for t, p in zip(np.asarray(labels), preds):
                cm[int(t), int(p)] += 1
        return cm

    # ------------------------------------------------------------- persistence
    def save(self, path: str) -> None:
        from stylex_tpu.ingest import save_msgpack_tree

        save_msgpack_tree(self.variables, path)

    def load(self, path: str) -> None:
        from flax import serialization

        payload = serialization.msgpack_restore(Path(path).read_bytes())
        self.variables = serialization.from_state_dict(self.variables, payload)
