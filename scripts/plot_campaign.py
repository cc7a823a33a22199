"""Plot training-campaign loss curves from the trainer's metrics.csv files."""

from __future__ import annotations

import argparse
import csv
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def load_csv(path: Path):
    with open(path) as f:
        rows = list(csv.reader(f))
    header, data = rows[0], rows[1:]
    cols = {h: [] for h in header}
    for r in data:
        if len(r) != len(header):
            continue
        for h, v in zip(header, r):
            try:
                cols[h].append(float(v))
            except ValueError:
                cols[h].append(float("nan"))
    return cols


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", default="runs/results")
    ap.add_argument("--names", nargs="+", default=["camp_old", "camp_new"])
    ap.add_argument("--out", default="docs/assets")
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    keys = ["g_loss", "d_loss", "rec_loss", "kl_loss", "gp", "step_time_s"]
    fig, axes = plt.subplots(2, 3, figsize=(15, 7))
    for name in args.names:
        csv_path = Path(args.results_dir) / name / "metrics.csv"
        if not csv_path.exists():
            print(f"skip {name}: no {csv_path}")
            continue
        cols = load_csv(csv_path)
        steps = cols.get("step", [])
        for ax, key in zip(axes.flat, keys):
            if key in cols:
                ax.plot(steps, cols[key], label=name, linewidth=0.8, alpha=0.85)
            ax.set_title(key)
            ax.set_xlabel("step")
            if key in ("g_loss", "d_loss", "rec_loss", "gp", "step_time_s"):
                ax.set_yscale("symlog", linthresh=1e-2)
    for ax in axes.flat:
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
    fig.suptitle("stylex_tpu training campaign — synthetic leaves 64px, 1× TPU v5e")
    fig.tight_layout()
    dest = out / "campaign_losses.png"
    fig.savefig(dest, dpi=110)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
