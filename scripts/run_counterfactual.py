"""Counterfactual-FID runner — the `FID_TensorFlow.ipynb` cells 20-28
workflow against OUR checkpoints (the Google-SavedModel twin lives in
`stylex_tpu.ingest_tf.google_fid_topk`).

Loads a trained StylEx checkpoint plus the AttFind artifacts written by
`stylex_tpu.run_attfind` (``style_change_records.hdf5`` +
``top_styles.json``) and computes FID(original, generated) followed by
FID(original, counterfactual top-1..k) with compounding shifts, writing
``fid_results.csv`` — reference `FID_TensorFlow.ipynb` cells 24-26.

    python scripts/run_counterfactual.py --name camp_r5_256 \\
        --models-dir runs/models --attfind-dir runs/attfind_r5_256 \\
        --classifier-name mobilenet --classifier-path ... --k 5
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="StylEx counterfactual FID (top-k)")
    p.add_argument("--name", required=True)
    p.add_argument("--base-dir", default="./")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--load-from", type=int, default=-1)
    p.add_argument("--classifier-name", default="resnet")
    p.add_argument("--classifier-path", default=None)
    p.add_argument("--attfind-dir", required=True,
                   help="folder holding style_change_records.hdf5 + top_styles.json")
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--shift-size", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--csv", default=None,
                   help="output CSV (default <attfind-dir>/fid_results.csv)")
    args = p.parse_args(argv)

    from stylex_tpu.attfind import load_records_hdf5
    from stylex_tpu.eval.counterfactual import fid_topk
    from stylex_tpu.train.trainer import Trainer
    from stylex_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    att = Path(args.attfind_dir)
    records = load_records_hdf5(str(att / "style_change_records.hdf5"))
    ranked = json.loads((att / "top_styles.json").read_text())["ranked"]
    ranked = [tuple(x) for x in ranked][: args.k]
    print(f"records: {records.style_change.shape[0]} images; "
          f"top-{len(ranked)} styles: {ranked}")

    trainer = Trainer(
        name=args.name,
        base_dir=args.base_dir,
        models_dir=args.models_dir,
        classifier_name=args.classifier_name,
        classifier_path=args.classifier_path,
    )
    trainer.load(args.load_from, inference=True, ship_ema=False)

    csv_path = args.csv or str(att / "fid_results.csv")
    t0 = time.perf_counter()
    fids = fid_topk(
        trainer.modules,
        trainer.full_params,
        trainer.classifier.classify_images,
        records,
        ranked,
        k=len(ranked),
        shift_size=args.shift_size,
        batch_size=args.batch_size,
        csv_path=csv_path,
    )
    dt = time.perf_counter() - t0
    print(f"fid_topk ({len(ranked) + 1} FID passes) in {dt:.1f}s -> {csv_path}")
    print("FID(original, generated)      =", round(fids[0], 4))
    for i, f in enumerate(fids[1:], 1):
        print(f"FID(original, counterfactual top-{i}) =", round(f, 4))


if __name__ == "__main__":
    main()
