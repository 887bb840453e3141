"""CSV metric logger with the Lightning CSVLogger directory layout the
reference relies on (``main.py:121``, ``log_every_n_steps=10`` at
``main.py:126``): ``logs/<name>/version_<k>/metrics.csv`` plus an
``hparams.yaml`` dump. Palette validation writes its per-epoch output PNGs
under the same ``log_dir`` (``models/palette.py:142-167``)."""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional

import yaml


class CSVLogger:
    def __init__(self, save_dir: str, name: str):
        base = os.path.join(save_dir, name)
        os.makedirs(base, exist_ok=True)
        version = 0
        while os.path.exists(os.path.join(base, f"version_{version}")):
            version += 1
        self.log_dir = os.path.join(base, f"version_{version}")
        os.makedirs(self.log_dir, exist_ok=True)
        self._path = os.path.join(self.log_dir, "metrics.csv")
        self._fieldnames: list[str] = ["epoch", "step"]
        self._appendable = False  # header not yet on disk

    def log_hparams(self, hparams: Dict) -> None:
        with open(os.path.join(self.log_dir, "hparams.yaml"), "w") as f:
            yaml.safe_dump(hparams, f)

    def log_metrics(self, metrics: Dict[str, float], step: int,
                    epoch: Optional[int] = None) -> None:
        row = {"step": step}
        if epoch is not None:
            row["epoch"] = epoch
        new_fields = False
        for k, v in metrics.items():
            row[k] = float(v)
            if k not in self._fieldnames:
                self._fieldnames.append(k)
                new_fields = True
        if new_fields and self._appendable:
            self._rewrite_header()
        with open(self._path, "w" if not self._appendable else "a",
                  newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            if not self._appendable:
                writer.writeheader()
            writer.writerow(row)
        self._appendable = True

    def _rewrite_header(self) -> None:
        # The header gained a column (a metric set seen for the first time
        # — e.g. the first validation row): stream the file through a temp
        # copy under the grown header, then atomically replace. O(file) IO
        # per distinct metric set, which is bounded; memory stays O(1) —
        # one row at a time, no retention (a long run logs a row every 10
        # steps forever).
        tmp = self._path + ".tmp"
        with open(self._path, newline="") as src, \
                open(tmp, "w", newline="") as dst:
            writer = csv.DictWriter(dst, fieldnames=self._fieldnames)
            writer.writeheader()
            for row in csv.DictReader(src):
                writer.writerow(row)
        os.replace(tmp, self._path)
