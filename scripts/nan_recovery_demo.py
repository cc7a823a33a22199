"""Live demonstration of the NaN -> checkpoint-reload -> retry path.

The reference handles training NaNs by reloading the last checkpoint and
raising ``NanException``, which its CLI retries 3x
(`/root/reference/stylex/stylex_train.py:1286-1291`, `cli.py:71-76`).
This script exercises that path for real: train a few steps, checkpoint,
poison the live generator params with NaN (so the next step's losses go
non-finite), and verify the trainer detects it, reloads the checkpoint,
raises, and can continue training cleanly afterwards.

Runs on CPU (tiny config) so it is cheap and hermetic.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

# runnable as `python scripts/nan_recovery_demo.py` from the repo root
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from stylex_tpu.config import ModelConfig, TrainConfig  # noqa: E402
from stylex_tpu.train.trainer import NanException, Trainer  # noqa: E402


def main(data_folder: str) -> None:
    tmp = Path(tempfile.mkdtemp(prefix="nan_demo_"))
    cfg = ModelConfig(image_size=32, network_capacity=4, latent_dim=34, encoder_dim=32)
    tc = TrainConfig(batch_size=2, gradient_accumulate_every=2, aug_prob=0.1,
                     save_every=2, evaluate_every=10_000)
    trainer = Trainer(
        name="nan_demo", results_dir=str(tmp / "results"), models_dir=str(tmp / "models"),
        model_cfg=cfg, train_cfg=tc, classifier_name="mobilenet", tensorboard_dir=None,
    )
    trainer.set_data_src(data_folder)

    for _ in range(3):
        trainer.train()
    assert trainer.checkpoint_num >= 1, "expected a checkpoint by step 3"
    print(f"[nan-demo] trained 3 steps, checkpoint #{trainer.checkpoint_num} on disk")

    # poison the live generator -> next step's g_loss is NaN
    good_leaf = np.asarray(jax.tree.leaves(trainer.state.params["G"])[0]).copy()
    poisoned = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), trainer.state.params["G"])
    trainer.state = trainer.state.replace(params={**trainer.state.params, "G": poisoned})

    # the CLI's retry loop (stylex_tpu/cli.py) around trainer.train():
    retries = 3
    recovered = False
    while True:
        try:
            metrics = trainer.train()
            recovered = True
            break
        except NanException:
            print(f"[nan-demo] NanException caught; retries left: {retries - 1}")
            retries -= 1
            if retries <= 0:
                raise
    assert recovered
    reloaded_leaf = np.asarray(jax.tree.leaves(trainer.state.params["G"])[0])
    assert np.all(np.isfinite(reloaded_leaf)), "params still NaN after reload"
    assert all(np.isfinite(v) for v in metrics.values() if isinstance(v, float))
    print("[nan-demo] recovered from checkpoint and completed a clean step:",
          {k: round(v, 4) for k, v in metrics.items() if isinstance(v, float)})

    # plain resume-from-checkpoint: a fresh Trainer picks up where we saved
    steps_before = trainer.steps
    trainer2 = Trainer(
        name="nan_demo", results_dir=str(tmp / "results"), models_dir=str(tmp / "models"),
        model_cfg=cfg, train_cfg=tc, classifier_name="mobilenet", tensorboard_dir=None,
    )
    trainer2.load(-1)
    trainer2.set_data_src(data_folder)
    trainer2.train()
    print(f"[nan-demo] cold resume: loaded ckpt, stepped {trainer2.steps} "
          f"(live trainer was at {steps_before})")
    print("[nan-demo] PASS")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/data/synth64")
