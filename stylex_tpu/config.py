"""Typed configuration for the whole framework.

One dataclass covers the union of the reference's ~60 ``train_from_folder``
CLI kwargs (`/root/reference/stylex/cli.py:84-221`), the ``Trainer`` kwargs
(`stylex_train.py:1002-1060`) and the ``USE_OLD_ARCHITECTURE`` module flag
(`cli.py:17-22`), replacing the reference's duplicated 1800-line
old/new training modules with a single ``arch`` enum field.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Tuple


class Arch(str, Enum):
    """Architecture variant (SURVEY §2.5).

    OLD: raw classifier logits concatenated into w; unconditional D
         (`stylex_train.py:1312,886`).
    NEW: softmax probabilities concatenated after the mapping net; projection
         (conditional) D; separate encoder LR (`stylex_train_new.py:332-333,
         912-914,967-969`).
    """

    OLD = "old"
    NEW = "new"


@dataclass
class ModelConfig:
    """Everything needed to (re)build the networks — the superset of the
    reference's persisted ``.config.json`` (`stylex_train.py:1215-1218`)."""

    image_size: int = 64
    network_capacity: int = 16
    fmap_max: int = 512
    latent_dim: int = 514  # 512 encoder dims + num_classes condition dims
    style_depth: int = 8
    lr_mlp: float = 0.1
    transparent: bool = False
    attn_layers: Tuple[int, ...] = ()
    no_const: bool = False
    num_classes: int = 2
    encoder_dim: int = 512
    arch: Arch = Arch.OLD
    encoder_class: Optional[str] = None  # debug encoder registry name
    fq_layers: Tuple[int, ...] = ()  # D feature-quantization layers
    fq_dict_size: int = 256
    # rematerialise generator blocks in the backward pass (trade FLOPs for
    # HBM at 256px+; jax.checkpoint per block)
    remat: bool = False

    @property
    def mapping_dim(self) -> int:
        """Mapping-net width: full latent for OLD, latent - num_classes for
        NEW (`stylex_train_new.py:940`)."""
        return self.latent_dim if self.arch == Arch.OLD else self.latent_dim - self.num_classes

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["arch"] = self.arch.value
        d["attn_layers"] = list(self.attn_layers)
        d["fq_layers"] = list(self.fq_layers)
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "ModelConfig":
        d = json.loads(s)
        d["arch"] = Arch(d.get("arch", "old"))
        d["attn_layers"] = tuple(d.get("attn_layers", ()))
        d["fq_layers"] = tuple(d.get("fq_layers", ()))
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass
class TrainConfig:
    """Training hyperparameters (defaults from `cli.py:85-170` /
    `stylex_train.py:1002-1060`)."""

    batch_size: int = 4
    gradient_accumulate_every: int = 8
    num_train_steps: int = 150_000
    lr: float = 2e-4
    ttur_mult: float = 1.5
    encoder_lr: Optional[float] = None  # NEW arch uses 1e-5 (`stylex_train_new.py:967-969`)
    mixed_prob: float = 0.9
    kl_scaling: float = 1.0
    rec_scaling: float = 1.0
    alternating_training: bool = True
    kl_rec_during_disc: bool = False  # NEW-arch option (`stylex_train_new.py:1062`)
    sample_from_encoder: bool = True
    dual_contrast_loss: bool = False
    rel_disc_loss: bool = False
    cl_reg: bool = False  # contrastive D regularisation (`stylex_train.py:943-947`)
    top_k_training: bool = False
    generator_top_k_gamma: float = 0.99
    generator_top_k_frac: float = 0.5
    aug_prob: Optional[float] = None  # auto-set from dataset size when None
    num_workers: Optional[int] = None  # decode threads; None = loader default
    aug_types: Tuple[str, ...] = ("translation", "cutout")
    dataset_aug_prob: float = 0.0
    no_pl_reg: bool = False
    gp_every: int = 4
    pl_every: int = 32
    pl_start_step: int = 5000
    ema_beta: float = 0.995
    ema_every: int = 10
    ema_start_step: int = 20_000
    ema_reset_every: int = 1000
    ema_reset_until: int = 25_000
    save_every: int = 500
    evaluate_every: int = 50
    calculate_fid_every: Optional[int] = None
    calculate_fid_num_images: int = 12_800
    trunc_psi: float = 0.75
    num_image_tiles: int = 8
    seed: int = 42
    # Precision/perf knobs (TPU-native; replaces apex O1):
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # Host-loop pipelining: number of steps whose metrics may remain
    # in flight before the host blocks to fetch/log/NaN-check them.
    # 0 = fetch synchronously every step (the reference's behavior,
    # `stylex_train.py:1457-1486`); >0 keeps the device queue full so
    # wall step time approaches device step time on relayed TPUs.
    # NaN detection lags by at most this many steps; the trainer drains
    # fully before every checkpoint save so a NaN state is never saved.
    metrics_lag: int = 8
    # Steps fused into ONE device dispatch (lax.scan over the train step).
    # 1 = the reference's one-optimizer-step-per-host-iteration loop; >1
    # amortises per-dispatch relay latency K-fold. Randomness and periodic
    # work are exact: step keys are pre-split with the sequential chain and
    # blocks are clamped so save/evaluate/FID steps end a block.
    steps_per_dispatch: int = 1
    # Checkpoint writes happen in a background thread after a device-side
    # snapshot (donation-safe); the train loop keeps stepping instead of
    # stalling ~45-50 s per save on a relayed chip. Durability points are
    # unchanged: loads, the next save, and process exit all join the
    # writer. False = the reference's blocking save.
    async_save: bool = True
    # Fuse the gradient-accumulation micro-batches of each phase into ONE
    # batched forward/backward (batch accum*B) instead of a lax.scan of
    # accum passes at batch B. Semantics are preserved exactly (per-micro-
    # batch RNG keys, per-micro-batch top-k/SimCLR/relativistic means, the
    # alternating encoder/prior schedule) up to float reassociation — see
    # make_train_step; tests/test_train.py asserts scan == fused. At the
    # reference's batch 4 the scan step is utilization-bound on TPU
    # (docs/ROOFLINE.md): batch-32 isolation measured 1.9x. False = the
    # literal accumulation loop.
    fused_microbatches: bool = True
    # Data parallel axis size; None = all visible devices.
    num_devices: Optional[int] = None

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["aug_types"] = list(self.aug_types)
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "TrainConfig":
        d = json.loads(s)
        d["aug_types"] = tuple(d.get("aug_types", ("translation", "cutout")))
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
