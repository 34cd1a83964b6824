"""Unit tests for the trainer hook system (engine/hooks.py).

Drives the hooks with a duck-typed fake trainer — no model, no jit — so
this lives in the quick lane. Parity anchor: detectron2 engine/hooks.py
(IterationTimer :84, PeriodicWriter :156, PeriodicCheckpointer :190,
BestCheckpointer :209, EvalHook :501).
"""
import time
from types import SimpleNamespace

from uninext_tpu.engine.events import EventStorage
from uninext_tpu.engine.hooks import (BestCheckpointer, EvalHook, HookBase,
                                      IterationTimer, LRSchedulerHook,
                                      MemoryStatsHook, PeriodicCheckpointer,
                                      PeriodicWriter, ProfilerHook,
                                      default_hooks)


class FakeCkpt:
    def __init__(self):
        self.saved = []

    def save(self, step, state):
        self.saved.append(int(step))


class FakeWriter:
    def __init__(self):
        self.writes = 0

    def write(self, storage):
        self.writes += 1


def fake_trainer():
    t = SimpleNamespace()
    t.storage = EventStorage()
    t.storage.iter = 0
    t.ckpt = FakeCkpt()
    t.writers = [FakeWriter()]
    t.state = SimpleNamespace(step=0, params={})
    t.model = None
    t.hooks = []
    return t


def run_loop(trainer, hooks, n_steps, metrics=None):
    trainer.hooks = hooks
    for h in hooks:
        h.before_train(trainer)
    for it in range(n_steps):
        trainer.storage.iter = it
        for h in hooks:
            h.before_step(trainer)
        time.sleep(0.001)  # the "step"
        trainer.state.step = it + 1
        for h in hooks:
            h.after_step(trainer, metrics or {"loss": 1.0})
    for h in hooks:
        h.after_train(trainer)


def test_periodic_writer_flushes_on_period_and_at_end():
    t = fake_trainer()
    run_loop(t, [PeriodicWriter(period=5)], 12)
    # writes at iters 4, 9 (period) + 1 at train end
    assert t.writers[0].writes == 3
    assert t.storage.latest()["loss"] == 1.0


def test_periodic_checkpointer_saves_period_and_final():
    t = fake_trainer()
    run_loop(t, [PeriodicCheckpointer(period=4)], 10)
    # saves at steps 4, 8 + final (step 10)
    assert t.ckpt.saved == [4, 8, 10]


def test_eval_hook_fans_out_to_best_checkpointer():
    t = fake_trainer()
    results_seq = iter([{"AP": 0.1}, {"AP": 0.3}, {"AP": 0.2}])

    def eval_fn(model, params):
        return next(results_seq)

    best = BestCheckpointer(metric="eval/AP")
    run_loop(t, [EvalHook(period=3, eval_fn=eval_fn), best], 9)
    # evals at iters 2, 5, 8 -> AP 0.1 (save@3), 0.3 (save@6), 0.2 (no save)
    assert t.ckpt.saved == [3, 6]
    assert best.best == 0.3
    assert t.storage.latest()["eval/AP"] == 0.2


def test_iteration_timer_splits_data_vs_step():
    timer = IterationTimer()
    t = fake_trainer()
    run_loop(t, [timer], 5)
    s = timer.summary()
    assert 0.0 <= s["data_frac"] <= 1.0
    assert abs(s["data_frac"] + s["step_frac"] - 1.0) < 1e-6
    assert s["step_frac"] > 0  # the sleep happened inside the step window
    assert "timer/step_frac" in t.storage.latest()


def test_lr_scheduler_hook_records_absolute_lr():
    t = fake_trainer()
    sched = lambda it: 0.5  # noqa: E731
    run_loop(t, [LRSchedulerHook(sched, period=2, base_lr=2e-4)], 4)
    assert abs(t.storage.latest()["lr"] - 1e-4) < 1e-12


def test_memory_stats_hook_noop_on_cpu():
    t = fake_trainer()
    run_loop(t, [MemoryStatsHook(period=2)], 4)  # CPU: memory_stats None/{}
    assert all(not k.startswith("mem/") or v >= 0
               for k, v in t.storage.latest().items())


def test_profiler_hook_window(tmp_path):
    t = fake_trainer()
    hook = ProfilerHook(start=1, stop=3, out_dir=str(tmp_path))
    run_loop(t, [hook], 5)
    assert not hook.active
    assert any(tmp_path.iterdir())  # a trace was dumped


def test_default_hooks_composition():
    cfg = SimpleNamespace(checkpoint_period=100, base_lr=1e-4)
    hooks = default_hooks(cfg, log_period=10, eval_fn=lambda m, p: {},
                          eval_period=50, profile_iters=(2, 4),
                          schedule_fn=lambda it: 1.0)
    kinds = [type(h).__name__ for h in hooks]
    assert kinds == ["IterationTimer", "PeriodicWriter",
                     "PeriodicCheckpointer", "LRSchedulerHook",
                     "MemoryStatsHook", "ProfilerHook", "EvalHook",
                     "BestCheckpointer"]
    assert all(isinstance(h, HookBase) for h in hooks)


def test_checkpoint_manager_idempotent_per_step(tmp_path):
    import jax.numpy as jnp
    from uninext_tpu.engine.checkpoint import CheckpointManager
    state = SimpleNamespace(params={"w": jnp.zeros((2,))},
                            opt_state={"m": jnp.zeros((2,))},
                            step=jnp.asarray(3))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(3, state)
    mgr.save(3, state)  # periodic + final at the same iter: must not raise
    assert mgr.latest_step() == 3


def test_tensorboard_writer_emits_event_file(tmp_path):
    """TensorBoardWriter parity with the reference's TensorboardXWriter
    (detectron2/utils/events.py:131): scalars land in an event file."""
    from uninext_tpu.engine.events import (TensorBoardWriter,
                                           tensorboard_available)
    if not tensorboard_available():
        import pytest
        pytest.skip("tensorboard not in image")
    st = EventStorage()
    st.put_scalars(total_loss=1.5, lr=1e-4)
    st.iter = 7
    w = TensorBoardWriter(str(tmp_path))
    w.write(st)
    w.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


def test_tensorboard_writer_skips_stale_scalars(tmp_path):
    """ADVICE r4: a scalar not re-put since the last write must NOT be
    re-emitted at a later iter (reference TensorboardXWriter tracks the
    last-written iteration per key); fresh puts at the same key write at
    their put-iteration."""
    from uninext_tpu.engine.events import (TensorBoardWriter,
                                           tensorboard_available)
    if not tensorboard_available():
        import pytest
        pytest.skip("tensorboard not in image")
    st = EventStorage()
    w = TensorBoardWriter(str(tmp_path))
    st.iter = 5
    st.put_scalars(loss=1.0)
    w.write(st)
    assert w._last_write["loss"] == 5
    st.iter = 25                 # periodic write fires again, no new put
    w.write(st)
    assert w._last_write["loss"] == 5, "stale scalar was re-emitted"
    st.put_scalars(loss=0.5)     # fresh value at iter 25
    w.write(st)
    assert w._last_write["loss"] == 25
    w.close()


def test_periodic_writer_closes_writers_after_train(tmp_path):
    """ADVICE r4: SummaryWriter buffers asynchronously (flush_secs=120);
    PeriodicWriter.after_train must close every writer or tail events are
    lost on process exit. JSONWriter's file handle doubles as the probe."""
    from uninext_tpu.engine.events import JSONWriter
    from uninext_tpu.engine.hooks import PeriodicWriter

    class T:
        pass

    t = T()
    t.storage = EventStorage()
    t.storage.put_scalars(loss=1.0)
    jw = JSONWriter(str(tmp_path / "metrics.json"))
    t.writers = [jw]
    PeriodicWriter().after_train(t)
    assert jw._f.closed
