"""Trainer hook system.

Parity: detectron2 engine/hooks.py (690 LoC) — IterationTimer :84,
PeriodicWriter :156, PeriodicCheckpointer :190, BestCheckpointer :209,
LRScheduler :306, TorchProfiler :376, EvalHook :501, TorchMemoryStats :638.
PreciseBN (:566) is intentionally absent: every batch-norm in this
framework is frozen (reference UNINEXT freezes them too — FrozenBN R50),
so there are no BN statistics to recompute.

The Trainer (engine/trainer.py) drives the loop:

    for h in hooks: h.before_train(trainer)
    for it in ...:
        for h in hooks: h.before_step(trainer)
        <jitted step>
        for h in hooks: h.after_step(trainer, metrics)
    for h in hooks: h.after_train(trainer)

plus `after_eval(trainer, results)` whenever an EvalHook fires. Hooks are
host-side Python — they never enter jit, matching the reference's design
where hooks wrap `run_step`.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional


class HookBase:
    """No-op base; subclasses override what they need."""

    def before_train(self, trainer):
        pass

    def before_step(self, trainer):
        pass

    def after_step(self, trainer, metrics: Dict):
        pass

    def after_eval(self, trainer, results: Dict):
        pass

    def after_train(self, trainer):
        pass


class IterationTimer(HookBase):
    """Tracks data vs compute time split (reference IterationTimer :84).

    after_train writes the summary into the trainer's EventStorage."""

    def __init__(self):
        self.t_data = 0.0
        self.t_step = 0.0
        self._mark = time.perf_counter()

    def before_train(self, trainer):
        self._mark = time.perf_counter()

    def before_step(self, trainer=None):
        now = time.perf_counter()
        self.t_data += now - self._mark
        self._mark = now

    def after_step(self, trainer=None, metrics=None):
        now = time.perf_counter()
        self.t_step += now - self._mark
        self._mark = now

    def summary(self) -> dict:
        tot = max(self.t_data + self.t_step, 1e-9)
        return {"data_frac": self.t_data / tot, "step_frac": self.t_step / tot}

    def after_train(self, trainer):
        if trainer is not None:
            trainer.storage.put_scalars(**{
                f"timer/{k}": v for k, v in self.summary().items()})


class PeriodicWriter(HookBase):
    """Flush the trainer's writers every `period` steps and at train end
    (reference PeriodicWriter :156). Converts device metrics to floats
    only when actually writing — the common path never syncs."""

    def __init__(self, period: int = 20):
        self.period = period

    def after_step(self, trainer, metrics: Dict):
        it = trainer.storage.iter
        if (it + 1) % self.period == 0:
            trainer.storage.put_scalars(
                **{k: float(v) for k, v in metrics.items()})
            for w in trainer.writers:
                w.write(trainer.storage)

    def after_train(self, trainer):
        # final write THEN close: SummaryWriter buffers asynchronously
        # (flush_secs=120) and events since the last auto-flush are lost if
        # the process exits without close() (ADVICE r4).
        for w in trainer.writers:
            w.write(trainer.storage)
            close = getattr(w, "close", None)
            if close is not None:
                close()


class PeriodicCheckpointer(HookBase):
    """Save train state every `period` steps + once at train end
    (reference PeriodicCheckpointer :190)."""

    def __init__(self, period: int):
        self.period = period

    def after_step(self, trainer, metrics: Dict):
        it = trainer.storage.iter
        if (it + 1) % self.period == 0:
            trainer.ckpt.save(it + 1, trainer.state)

    def after_train(self, trainer):
        trainer.ckpt.save(int(trainer.state.step), trainer.state)


class BestCheckpointer(HookBase):
    """Keep the checkpoint with the best eval metric (e.g. 'eval/AP';
    reference BestCheckpointer :209)."""

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


class EvalHook(HookBase):
    """Run `eval_fn(model, params) -> dict` every `period` steps and at
    train end, record results under eval/ and fan out to after_eval hooks
    (reference EvalHook :501)."""

    def __init__(self, period: int, eval_fn: Callable, eval_at_end=False):
        self.period = period
        self.eval_fn = eval_fn
        self.eval_at_end = eval_at_end

    def _run(self, trainer):
        results = self.eval_fn(trainer.model, trainer.state.params)
        trainer.storage.put_scalars(
            **{f"eval/{k}": v for k, v in results.items()
               if isinstance(v, (int, float))})
        for h in trainer.hooks:
            h.after_eval(trainer, results)

    def after_step(self, trainer, metrics: Dict):
        if self.period > 0 and (trainer.storage.iter + 1) % self.period == 0:
            self._run(trainer)

    def after_train(self, trainer):
        if self.eval_at_end:
            self._run(trainer)


class LRSchedulerHook(HookBase):
    """Record the current learning rate each logging period (reference
    LRScheduler :306 — here the schedule lives inside optax, so the hook
    recomputes it from the solver config for observability)."""

    def __init__(self, schedule_fn: Callable[[int], float], period: int = 20,
                 base_lr: float = 1.0, accum_steps: int = 1):
        self.schedule_fn = schedule_fn  # relative multiplier (optimizer.py)
        self.base_lr = base_lr
        self.period = period
        # schedule_fn is in optimizer-UPDATE units; the loop iterates
        # micro-steps (accum_steps per update) — convert before lookup
        self.accum_steps = max(1, accum_steps)

    def after_step(self, trainer, metrics: Dict):
        it = trainer.storage.iter
        if (it + 1) % self.period == 0:
            trainer.storage.put_scalars(
                lr=self.base_lr * float(self.schedule_fn(
                    it // self.accum_steps)))


class MemoryStatsHook(HookBase):
    """Device memory observability (reference TorchMemoryStats :638):
    records bytes_in_use / peak_bytes_in_use from the first device's
    allocator stats every `period` steps (no-op on backends without
    memory_stats, e.g. CPU)."""

    def __init__(self, period: int = 100):
        self.period = period
        self.last: Dict[str, float] = {}

    def after_step(self, trainer, metrics: Dict):
        if (trainer.storage.iter + 1) % self.period:
            return
        import jax
        stats = jax.local_devices()[0].memory_stats() or {}
        keep = {f"mem/{k}": float(v) for k, v in stats.items()
                if k in ("bytes_in_use", "peak_bytes_in_use",
                         "bytes_limit")}
        if keep:
            self.last = keep
            trainer.storage.put_scalars(**keep)


class ProfilerHook(HookBase):
    """jax.profiler trace window over iterations [start, stop) (reference
    TorchProfiler :376)."""

    def __init__(self, start: int, stop: int, out_dir: str):
        self.start = start
        self.stop = stop
        self.out_dir = out_dir
        self.active = False

    def before_step(self, trainer):
        import jax
        it = trainer.storage.iter
        if it == self.start and not self.active:
            jax.profiler.start_trace(self.out_dir)
            self.active = True
        if it == self.stop and self.active:
            jax.profiler.stop_trace()
            self.active = False

    def after_train(self, trainer):
        if self.active:                       # window open at train end
            import jax
            jax.profiler.stop_trace()
            self.active = False


def default_hooks(cfg_solver, log_period: int = 20,
                  eval_fn: Optional[Callable] = None,
                  eval_period: int = 5000,
                  profile_iters: Optional[tuple] = None,
                  profile_dir: str = "./profile",
                  schedule_fn: Optional[Callable] = None,
                  accum_steps: int = 1):
    """The Trainer's standard hook stack, mirroring DefaultTrainer
    .build_hooks (reference engine/defaults.py:340-380).

    log/checkpoint/eval periods are in optimizer-UPDATE units; with
    grad accumulation (accum_steps=k) the loop iterates micro-steps, so
    the periods are scaled by k here to keep their documented meaning."""
    k = max(1, accum_steps)
    hooks = [IterationTimer(), PeriodicWriter(log_period * k),
             PeriodicCheckpointer(cfg_solver.checkpoint_period * k)]
    if schedule_fn is not None:
        hooks.append(LRSchedulerHook(schedule_fn, log_period * k,
                                     base_lr=cfg_solver.base_lr,
                                     accum_steps=k))
    hooks.append(MemoryStatsHook(max(log_period * k * 5, 100)))
    if profile_iters:
        hooks.append(ProfilerHook(profile_iters[0], profile_iters[1],
                                  profile_dir))
    if eval_fn is not None:
        hooks.append(EvalHook(eval_period * k, eval_fn))
        hooks.append(BestCheckpointer())
    return hooks
