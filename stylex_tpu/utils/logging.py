"""Metric sinks: stdout, TensorBoard, and CSV files.

Mirrors the reference's four sinks (SURVEY §5.5): TensorBoard scalars
``loss/{G,D,rec,kl}`` (`stylex_train.py:1457-1461`), the ``print_log``
stdout line (`:1700-1715`), and file outputs. The optional ``aim`` sink is
covered by the CSV sink (aim isn't in this image).
"""

from __future__ import annotations

import csv
import os
import time
from pathlib import Path
from typing import Dict, Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, tensorboard_dir: Optional[str] = None, name: str = "default",
                 csv_path: Optional[str] = None):
        self.tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(tensorboard_dir, name))
            except Exception:
                self.tb = None
        self.csv_path = csv_path
        self._csv_fields: Optional[list] = None
        self._csv_warned = False
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self.tb is not None:
            self.tb.add_scalar("loss/G", metrics.get("g_loss", 0.0), step)
            self.tb.add_scalar("loss/D", metrics.get("d_loss", 0.0), step)
            self.tb.add_scalar("loss/rec", metrics.get("rec_loss", 0.0), step)
            self.tb.add_scalar("loss/kl", metrics.get("kl_loss", 0.0), step)
        if self.csv_path:
            Path(self.csv_path).parent.mkdir(parents=True, exist_ok=True)
            # Rows are keyed to a FIXED column set (the existing file's
            # header on resume, else the first row's keys): appending
            # metrics.values() positionally silently misaligns columns when
            # the key set or order varies between calls or across resumes.
            if self._csv_fields is None:
                if os.path.exists(self.csv_path):
                    with open(self.csv_path, newline="") as f:
                        header = f.readline().strip()
                    self._csv_fields = header.split(",")[1:] if header else list(metrics)
                else:
                    self._csv_fields = list(metrics)
                    with open(self.csv_path, "a", newline="") as f:
                        csv.writer(f).writerow(["step", *self._csv_fields])
            unknown = [k for k in metrics if k not in self._csv_fields]
            if unknown and not self._csv_warned:
                print(f"[stylex_tpu] metrics CSV drops keys not in its header: {unknown}")
                self._csv_warned = True
            with open(self.csv_path, "a", newline="") as f:
                csv.writer(f).writerow(
                    [step]
                    + [
                        f"{metrics[k]:.6g}" if k in metrics else ""
                        for k in self._csv_fields
                    ]
                )

    def print_line(self, step: int, metrics: Dict[str, float]) -> str:
        """The reference's ``G | D | GP | PL | CR | Q | FID | Rec | KL``
        status line (`stylex_train.py:1700-1715`)."""
        parts = [f"step {step}"]
        for label, key in [("G", "g_loss"), ("D", "d_loss"), ("GP", "gp"),
                           ("PL", "pl_mean"), ("CR", "cr_loss"), ("Q", "q_loss"),
                           ("FID", "fid"), ("Rec", "rec_loss"), ("KL", "kl_loss")]:
            if key in metrics:
                parts.append(f"{label}: {metrics[key]:.4f}")
        line = " | ".join(parts)
        print(line, flush=True)
        return line
