"""Replay-results CLI — the ``all_results_notebook.ipynb`` equivalent.

The reference README's headline entry point renders the full top-k report
and counterfactual panels from *precomputed* latents
(`/root/reference/README.md:54-61`; the notebook blob itself is missing
from the repo, `.MISSING_LARGE_BLOBS:1`) — i.e. no StyleSpace re-sweep.
This driver does the same from a ``style_change_records.hdf5`` written by
:mod:`stylex_tpu.run_attfind` (reference-compatible schema):

    python -m stylex_tpu.replay_results --records ./attfind_out/style_change_records.hdf5 \\
        --name my_model --num-indices 5 --out ./replay_out

Always produced (no model needed): the per-class greedy picks, the merged
ranked top-k list (printed + ``top_styles.json``), and per-style effect
summaries. With a checkpoint (``--name``/``--base-dir``; generation needs
the generator) it additionally renders the counterfactual panel suite —
by-effect (cell 20) and by-distance-in-S (cell 21) — for the top styles.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser(
        description="Replay StylEx AttFind results from precomputed records"
    )
    p.add_argument("--records", required=True,
                   help="path to style_change_records.hdf5")
    p.add_argument("--out", default="./replay_results")
    p.add_argument("--num-indices", type=int, default=5)
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--effect-threshold", type=float, default=0.5)
    p.add_argument("--shift-size", type=float, default=1.0)
    # panel rendering (optional; requires a checkpoint)
    p.add_argument("--name", default=None,
                   help="model name under --models-dir; omit for report-only")
    p.add_argument("--base-dir", default="./")
    p.add_argument("--models-dir", default="models")
    p.add_argument("--load-from", type=int, default=-1)
    p.add_argument("--classifier-name", default="resnet")
    p.add_argument("--classifier-path", default=None)
    p.add_argument("--visualize-top", type=int, default=5)
    p.add_argument("--panel-threshold", type=float, default=0.1)
    p.add_argument("--min-images", type=int, default=1)
    p.add_argument("--max-images", type=int, default=10)
    args = p.parse_args(argv)

    from stylex_tpu.attfind import load_records_hdf5, rank_styles, warn_visualize_top

    records = load_records_hdf5(args.records)
    n, _, c, k = records.style_change.shape
    print(f"records: {n} images x {c} StyleSpace coordinates x 2 directions "
          f"({args.records})")

    ranked, per_class = rank_styles(
        records,
        num_classes=args.num_classes,
        num_indices=args.num_indices,
        effect_threshold=args.effect_threshold,
    )
    warn_visualize_top(args.visualize_top, len(ranked), args.num_indices)

    labels = np.argmax(records.base_prob, axis=1)
    for ci in range(args.num_classes):
        print(f"class {ci}: {int((labels == ci).sum())} images, "
              f"picks {per_class.get(ci, [])}")
    print("Directions and style indices for moving from class 1 to class 0 =",
          ranked[: args.num_indices])
    print("Use the other direction to move from class 0 to 1.")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    summary = {
        "ranked": ranked,
        "per_class": {str(kk): v for kk, v in per_class.items()},
        "num_images": int(n),
        "num_style_coords": int(c),
        "per_style": [
            {
                "direction": int(d),
                "sindex": int(s),
                "mean_effect_class0": float(np.mean(records.style_change[:, d, s, 0])),
                "mean_effect_class1": float(
                    np.mean(records.style_change[:, 1 - d, s, 1])
                ),
                "num_images_above_threshold": int(
                    (records.style_change[:, d, s, 0] > args.panel_threshold).sum()
                ),
            }
            for d, s in ranked
        ],
    }
    (out / "top_styles.json").write_text(json.dumps(summary, indent=1))
    print(f"report written to {out / 'top_styles.json'}")

    if args.name is None:
        print("no --name given: report-only (pass a checkpoint name to render "
              "counterfactual panels)")
        return

    from PIL import Image

    from stylex_tpu.attfind import visualize_style, visualize_style_by_distance_in_s
    from stylex_tpu.train.trainer import Trainer

    trainer = Trainer(
        name=args.name,
        base_dir=args.base_dir,
        models_dir=args.models_dir,
        classifier_name=args.classifier_name,
        classifier_path=args.classifier_path,
    )
    trainer.load(args.load_from, inference=True)
    modules, params = trainer.modules, trainer.full_params
    clf_fn = trainer.classifier.classify_images

    rendered = 0
    for direction, sindex in ranked[: args.visualize_top]:
        panel = visualize_style(
            modules, params, clf_fn, records, sindex, direction,
            shift_size=args.shift_size, effect_threshold=args.panel_threshold,
            max_images=args.max_images, min_images=args.min_images,
        )
        if panel is not None:
            Image.fromarray(panel).save(out / f"style_{direction}_{sindex}.png")
            rendered += 1
        panel_d = visualize_style_by_distance_in_s(
            modules, params, clf_fn, records, sindex, direction,
            shift_size=args.shift_size, max_images=args.max_images,
        )
        Image.fromarray(panel_d).save(
            out / f"style_{direction}_{sindex}_by_distance.png"
        )
    print(f"panels rendered for top {args.visualize_top} styles "
          f"({rendered} passed the effect threshold) under {out}")


if __name__ == "__main__":
    main()
