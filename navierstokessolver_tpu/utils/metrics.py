"""Structured per-window metrics/logging (SURVEY.md SS5 "Metrics" row).

Emits one line per logging window with exactly the BASELINE.json metrics:
step, sim time, CFL, Poisson iters, residual, max divergence, MLUPS and
wall-ms/step. Optional CSV sink for regression tracking.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class WindowStats:
    step: int
    sim_time: float
    dt: float
    steps: int
    wall_s: float
    n_cells: int
    poisson_iters_mean: float
    poisson_iters_max: int
    residual: float
    max_div: float
    max_cfl: float

    @property
    def mlups(self) -> float:
        return self.n_cells * self.steps / self.wall_s / 1e6

    @property
    def wall_ms_per_step(self) -> float:
        return self.wall_s / self.steps * 1e3

    @staticmethod
    def from_diag(diag, *, step, dt, wall_s, n_cells) -> "WindowStats":
        iters = np.asarray(diag.poisson_iters)
        return WindowStats(
            step=int(step),
            sim_time=float(step * dt),
            dt=float(dt),
            steps=len(iters),
            wall_s=float(wall_s),
            n_cells=int(n_cells),
            poisson_iters_mean=float(iters.mean()),
            poisson_iters_max=int(iters.max()),
            residual=float(np.asarray(diag.poisson_res)[-1]),
            max_div=float(np.asarray(diag.max_div).max()),
            max_cfl=float(np.asarray(diag.max_cfl).max()),
        )

    def as_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["mlups"] = round(self.mlups, 2)
        d["wall_ms_per_step"] = round(self.wall_ms_per_step, 3)
        return d


class StepLogger:
    """Logs one JSON line per window to a stream and optionally CSV."""

    def __init__(self, stream=None, csv_path: Optional[str] = None):
        self.stream = stream if stream is not None else sys.stderr
        self.csv_path = csv_path
        self._csv_header_written = False
        self.t0 = time.perf_counter()

    def log(self, stats: WindowStats) -> None:
        d = stats.as_dict()
        print(json.dumps(d), file=self.stream, flush=True)
        if self.csv_path:
            import csv

            mode = "a" if self._csv_header_written else "w"
            with open(self.csv_path, mode, newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(d))
                if not self._csv_header_written:
                    w.writeheader()
                    self._csv_header_written = True
                w.writerow(d)
