"""Pretrained-weight ingestion: torch state dicts -> cached native msgpack.

The reference depends on three pretrained torch networks — the frozen
classifier (MobileNet/ResNet, `stylex_train.py:1152-1161`), LPIPS-alex for
the reconstruction loss (`stylex_train.py:404`), and InceptionV3 for FID
(`FID_TensorFlow.ipynb`) — all fetched from the network at runtime. This
container is offline, so ingestion is explicit: run this tool once per
checkpoint you have on disk, and the converted weights are cached as flax
msgpack that every consumer (Trainer, FID, build_classifier) loads without
torch in the loop.

    python -m stylex_tpu.ingest classifier --src mobilenet.pt --kind mobilenet \\
        --out saved_models/classifier.msgpack [--num-classes 2]
    python -m stylex_tpu.ingest lpips     --src lpips_alex.pt  --out saved_models/lpips_alex.msgpack
    python -m stylex_tpu.ingest inception --src inception_v3.pt --out saved_models/inception_fid.msgpack

Consumers then take the .msgpack path directly:

    Trainer(..., classifier_path='saved_models/classifier.msgpack',
            lpips_path='saved_models/lpips_alex.msgpack')
    STYLEX_TPU_INCEPTION=saved_models/inception_fid.msgpack  # FID

Loaders FAIL LOUDLY when an explicitly requested weights file is missing or
malformed — the silent random-init fallback only applies when no weights
were requested at all.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def save_msgpack_tree(tree, out: str) -> int:
    """Serialize a pytree (state-dict form, host numpy) to ``out``.

    The one shared msgpack writer — ClassifierTrainer.save and the ingest
    CLI both use it so the on-disk format cannot drift.
    """
    import jax
    from flax import serialization

    Path(out).parent.mkdir(parents=True, exist_ok=True)
    payload = serialization.msgpack_serialize(
        jax.tree.map(lambda x: np.asarray(x), serialization.to_state_dict(tree))
    )
    Path(out).write_bytes(payload)
    return len(payload)


def _save_msgpack(tree, out: str) -> None:
    size = save_msgpack_tree(tree, out)
    print(f"wrote {out} ({size / 1e6:.1f} MB)")


def load_msgpack_tree(path: str):
    """Restore a raw (nested-dict) msgpack tree; raises on missing file."""
    from flax import serialization

    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"weights file not found: {path}")
    return serialization.msgpack_restore(p.read_bytes())


def _torch_sd(path: str):
    import torch

    if not os.path.exists(path):
        raise FileNotFoundError(f"torch checkpoint not found: {path}")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    # some torch checkpoints nest the state dict
    for key in ("state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return sd


def ingest_classifier(src: str, kind: str, out: str, num_classes: int = 2) -> None:
    from stylex_tpu.models.classifiers import (
        convert_mobilenet_v2_state_dict,
        convert_resnet18_state_dict,
    )

    sd = _torch_sd(src)
    conv = convert_resnet18_state_dict if kind == "resnet" else convert_mobilenet_v2_state_dict
    _save_msgpack(conv(sd, num_classes), out)


def ingest_lpips(src: str, out: str) -> None:
    from stylex_tpu.models.lpips import convert_lpips_state_dict

    _save_msgpack(convert_lpips_state_dict(_torch_sd(src)), out)


def ingest_inception(src: str, out: str) -> None:
    from stylex_tpu.models.inception import convert_inception_state_dict

    _save_msgpack(convert_inception_state_dict(_torch_sd(src)), out)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="net", required=True)
    for net in ("classifier", "lpips", "inception"):
        p = sub.add_parser(net)
        p.add_argument("--src", required=True, help="torch state-dict (.pt) path")
        p.add_argument("--out", required=True, help="output .msgpack path")
        if net == "classifier":
            p.add_argument("--kind", default="mobilenet", choices=["mobilenet", "resnet"])
            p.add_argument("--num-classes", type=int, default=2)
    args = ap.parse_args(argv)
    if args.net == "classifier":
        ingest_classifier(args.src, args.kind, args.out, args.num_classes)
    elif args.net == "lpips":
        ingest_lpips(args.src, args.out)
    else:
        ingest_inception(args.src, args.out)


if __name__ == "__main__":
    main()
