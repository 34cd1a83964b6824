"""Trainer integration: loader -> jitted steps -> metrics.json -> checkpoint
-> resume. Runs the tiny config for a few iterations on the CPU mesh."""
import dataclasses
import json
import os

import numpy as np
import pytest

from test_model import small_cfg
from test_pipeline import coco_dir  # fixture


def test_trainer_smoke(coco_dir, tmp_path):
    import jax
    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.engine.trainer import Trainer

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, min_size_train=(64,),
                                 max_size_train=96),
        solver=dataclasses.replace(cfg.solver, max_iter=3,
                                   checkpoint_period=2, warmup_iters=1))
    records, cats = load_coco_json(str(coco_dir / "train.json"), str(coco_dir))
    mapper = UniDatasetMapper(cfg.data, cats, is_train=True)
    loader = iter(MultiDatasetLoader([(records, mapper, 8)], [1.0], seed=0,
                                     num_workers=1))
    out = str(tmp_path / "out")
    trainer = Trainer(cfg, loader, output_dir=out, task="detection",
                      use_mesh=True, log_period=1)
    trainer.train()

    # metrics.json written with loss scalars
    lines = [json.loads(l) for l in open(f"{out}/metrics.json")]
    assert lines and "total_loss" in lines[-1]
    assert np.isfinite(lines[-1]["total_loss"])
    # checkpoint saved at max_iter
    ckpts = os.listdir(f"{out}/checkpoints")
    assert any("3" in c for c in ckpts), ckpts

    # resume restores the step counter
    loader2 = iter(MultiDatasetLoader([(records, mapper, 8)], [1.0], seed=1,
                                      num_workers=1))
    trainer2 = Trainer(cfg, loader2, output_dir=out, task="detection",
                       use_mesh=True, log_period=1)
    resumed = trainer2.resume_or_load()
    assert resumed
    assert int(trainer2.state.step) == 3


def test_trainer_grad_accum_units(coco_dir, tmp_path):
    """grad_accum_steps=k contract (ADVICE r3, config.py SolverConfig):
    max_iter / checkpoint_period stay in optimizer-UPDATE units; the loop
    runs k micro-steps per update. With max_iter=2, k=2: 4 micro-steps,
    exactly 2 optimizer updates (params immobile mid-accumulation), and the
    checkpoint at the end carries step=4 (micro-steps)."""
    import jax
    import numpy as np
    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.engine.trainer import Trainer

    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, min_size_train=(64,),
                                 max_size_train=96),
        solver=dataclasses.replace(cfg.solver, max_iter=2,
                                   checkpoint_period=5, warmup_iters=0,
                                   grad_accum_steps=2))
    records, cats = load_coco_json(str(coco_dir / "train.json"),
                                   str(coco_dir))
    mapper = UniDatasetMapper(cfg.data, cats, is_train=True)
    loader = iter(MultiDatasetLoader([(records, mapper, 8)], [1.0], seed=0,
                                     num_workers=1))
    out = str(tmp_path / "out_accum")
    trainer = Trainer(cfg, loader, output_dir=out, task="detection",
                      use_mesh=True, log_period=1)

    def snap(params):  # all leaves, not just the first (some groups are 0-lr)
        return np.concatenate([np.asarray(l).ravel()
                               for l in jax.tree_util.tree_leaves(params)])

    seen = [snap(trainer.state.params)]
    from uninext_tpu.engine.hooks import HookBase

    class Probe(HookBase):
        def after_step(self, tr, metrics):
            seen.append(snap(tr.state.params))

    trainer.hooks.append(Probe())
    trainer.train()
    # 4 micro-steps ran; params move ONLY on micro-steps 2 and 4
    assert len(seen) == 5, len(seen)
    assert np.array_equal(seen[1], seen[0])     # mid-accumulation: no move
    assert not np.array_equal(seen[2], seen[1])  # update 1
    assert np.array_equal(seen[3], seen[2])
    assert not np.array_equal(seen[4], seen[3])  # update 2
    assert int(trainer.state.step) == 4


def test_chunked_steps_match_sequential(coco_dir, tmp_path):
    """solver.chunk_steps=k (round-5 dispatch amortization): ONE jitted
    lax.scan of k steps must produce the same final params as k sequential
    dispatches — same rng stream, same optimizer updates."""
    import jax
    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.engine.trainer import Trainer

    def build(chunk, out):
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, min_size_train=(64,),
                                     max_size_train=96),
            solver=dataclasses.replace(cfg.solver, max_iter=4,
                                       checkpoint_period=10 ** 9,
                                       warmup_iters=1, chunk_steps=chunk))
        records, cats = load_coco_json(str(coco_dir / "train.json"),
                                       str(coco_dir))
        mapper = UniDatasetMapper(cfg.data, cats, is_train=True)
        loader = iter(MultiDatasetLoader([(records, mapper, 2)], [1.0],
                                         seed=0, num_workers=1))
        tr = Trainer(cfg, loader, output_dir=out, task="detection",
                     use_mesh=False, log_period=1)
        tr.train()
        return tr

    t_seq = build(1, str(tmp_path / "seq"))
    t_chk = build(2, str(tmp_path / "chk"))
    assert int(t_seq.state.step) == int(t_chk.state.step) == 4
    a = jax.tree_util.tree_leaves(t_seq.state.params)
    b = jax.tree_util.tree_leaves(t_chk.state.params)
    # atol 5e-6: the scan-inlined step is the same math but XLA may
    # reassociate floating-point reductions; the isolated scan-vs-
    # sequential probe measured 0/472 mismatched leaves at 1e-6 and the
    # residual here is a couple of near-zero elements at ~1.6e-6
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=5e-6)


def test_chunked_steps_flush_partial_tail(coco_dir, tmp_path):
    """total not divisible by chunk: the tail dispatches as a smaller
    chunk and the step count still lands exactly on max_iter."""
    import dataclasses as dc
    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.engine.trainer import Trainer

    cfg = small_cfg()
    cfg = dc.replace(
        cfg,
        data=dc.replace(cfg.data, min_size_train=(64,), max_size_train=96),
        solver=dc.replace(cfg.solver, max_iter=5, checkpoint_period=10 ** 9,
                          warmup_iters=1, chunk_steps=3))
    records, cats = load_coco_json(str(coco_dir / "train.json"),
                                   str(coco_dir))
    mapper = UniDatasetMapper(cfg.data, cats, is_train=True)
    loader = iter(MultiDatasetLoader([(records, mapper, 2)], [1.0], seed=0,
                                     num_workers=1))
    tr = Trainer(cfg, loader, output_dir=str(tmp_path / "o"),
                 task="detection", use_mesh=False, log_period=1)
    tr.train()
    assert int(tr.state.step) == 5
