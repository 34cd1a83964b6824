"""Trainer hooks beyond the built-ins: BestCheckpointer, IterationTimer.

Parity: detectron2 engine/hooks.py (BestCheckpointer :209, IterationTimer
:84). The Trainer calls hook.after_step(trainer) / hook.after_eval(trainer,
results).
"""
from __future__ import annotations

import time
from typing import Optional


class BestCheckpointer:
    """Keep the checkpoint with the best eval metric (e.g. 'eval/AP')."""

    def __init__(self, metric: str = "eval/AP", mode: str = "max"):
        self.metric = metric
        self.mode = mode
        self.best: Optional[float] = None

    def after_eval(self, trainer, results: dict):
        val = results.get(self.metric.replace("eval/", ""))
        if val is None:
            return
        better = (self.best is None
                  or (self.mode == "max" and val > self.best)
                  or (self.mode == "min" and val < self.best))
        if better:
            self.best = float(val)
            trainer.ckpt.save(int(trainer.state.step), trainer.state)


class IterationTimer:
    """Tracks data vs compute time split (CommonMetricPrinter companion)."""

    def __init__(self):
        self.t_data = 0.0
        self.t_step = 0.0
        self._mark = time.perf_counter()

    def before_step(self):
        now = time.perf_counter()
        self.t_data += now - self._mark
        self._mark = now

    def after_step(self):
        now = time.perf_counter()
        self.t_step += now - self._mark
        self._mark = now

    def summary(self) -> dict:
        tot = max(self.t_data + self.t_step, 1e-9)
        return {"data_frac": self.t_data / tot, "step_frac": self.t_step / tot}
