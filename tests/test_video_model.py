"""Video (key, ref) training path: reid contrastive loss end-to-end."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uninext_tpu.models.detr import UninextDETR
from test_model import small_cfg, make_batch, B, H, W, T, G


def test_video_train_losses():
    cfg = dataclasses.replace(small_cfg(), use_reid=True)
    model = UninextDETR(cfg)
    images, img_mask, sizes, tids, tmask, targets_key = make_batch(0)
    images_ref = make_batch(1)[0]
    targets_ref = dict(targets_key)  # same objects, slot-aligned
    # object 0 disappears in the ref frame
    valid_ref = np.asarray(targets_ref["valid"]).copy()
    valid_ref[0, 0] = False
    targets_ref = {**targets_ref, "valid": jnp.array(valid_ref)}

    @jax.jit
    def run(rng):
        params = model.init(
            {"params": rng, "dn": jax.random.PRNGKey(1)},
            images, img_mask, sizes, tids, tmask,
            targets_key, targets_ref, images_ref,
            method=UninextDETR.forward_video_train)
        losses = model.apply(
            params, images, img_mask, sizes, tids, tmask,
            targets_key, targets_ref, images_ref,
            method=UninextDETR.forward_video_train)
        return losses

    losses = run(jax.random.PRNGKey(0))
    assert "loss_reid" in losses and "loss_reid_aux" in losses
    assert "loss_ce" in losses and "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_video_train_step():
    """Stage-3 two-frame train step: gradients flow, loss drops on a fixed
    batch (engine/train.py make_video_train_step)."""
    from uninext_tpu.engine.train import (create_video_train_state,
                                          make_video_train_step)

    cfg = dataclasses.replace(small_cfg(), use_reid=True)
    images, img_mask, sizes, tids, tmask, targets_key = make_batch(0)
    batch = {
        "images_key": images, "images_ref": make_batch(1)[0],
        "img_mask": img_mask, "image_sizes": sizes,
        "text_ids": tids, "text_mask": tmask,
        "targets_key": targets_key, "targets_ref": dict(targets_key),
    }
    model, state = create_video_train_state(cfg, jax.random.PRNGKey(0),
                                            batch)
    step = make_video_train_step(model, cfg)
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(4):
        rng, sr = jax.random.split(rng)
        state, metrics = step(state, batch, sr)
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1])
        assert "loss_reid" in metrics
    assert losses[-1] < losses[0]
    assert int(state.step) == 4


def test_trainer_video_mode(tmp_path):
    """Trainer(video=True) drives the stage-3 pair step end-to-end
    (tools/train_net.py --recipe video_joint / single_task_* path)."""
    from uninext_tpu.engine.trainer import Trainer

    cfg = dataclasses.replace(small_cfg(), use_reid=True)
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_iter=2,
                                        checkpoint_period=1000,
                                        warmup_iters=1))
    images, img_mask, sizes, tids, tmask, targets_key = make_batch(0)
    batch = {
        "images_key": np.asarray(images), "images_ref": np.asarray(
            make_batch(1)[0]),
        "img_mask": np.asarray(img_mask), "image_sizes": np.asarray(sizes),
        "text_ids": np.asarray(tids), "text_mask": np.asarray(tmask),
        "targets_key": jax.tree.map(np.asarray, targets_key),
        "targets_ref": jax.tree.map(np.asarray, dict(targets_key)),
    }

    def loader():
        while True:
            yield batch

    tr = Trainer(cfg, loader(), output_dir=str(tmp_path), task="detection",
                 use_mesh=False, video=True, log_period=1)
    tr.train()
    assert int(tr.state.step) == 2


def test_sot_train_step():
    """SOT stage-3 step (forward_sot_train): template from the ref frame's
    gt box as the prompt, grounding-style losses on the key frame, no reid
    (reference coco_forward_sot, ddetrs_vid.py:197)."""
    from uninext_tpu.engine.train import (create_video_train_state,
                                          make_video_train_step)

    cfg = small_cfg()
    images, img_mask, sizes, tids, tmask, targets_key = make_batch(0)
    batch = {
        "images_key": images, "images_ref": make_batch(1)[0],
        "img_mask": img_mask, "image_sizes": sizes,
        "text_ids": tids, "text_mask": tmask,
        "targets_key": targets_key, "targets_ref": dict(targets_key),
    }
    model, state = create_video_train_state(cfg, jax.random.PRNGKey(0),
                                            batch, task="sot")
    step = make_video_train_step(model, cfg, task="sot")
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(3):
        rng, sr = jax.random.split(rng)
        state, metrics = step(state, batch, sr)
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(losses[-1])
        assert "loss_reid" not in metrics          # sot has no reid loss
    assert losses[-1] < losses[0]


def test_trainer_routes_tagged_batches():
    """Batches tagged "__task__" (multi-task recipes) are routed to the
    matching train step: a detection (reid) batch and a sot (template)
    batch train through ONE Trainer/state."""
    from uninext_tpu.engine.trainer import Trainer

    cfg = dataclasses.replace(small_cfg(), use_reid=True)
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, max_iter=2,
                                        checkpoint_period=1000,
                                        warmup_iters=1))
    images, img_mask, sizes, tids, tmask, targets_key = make_batch(0)
    base = {
        "images_key": np.asarray(images), "images_ref": np.asarray(
            make_batch(1)[0]),
        "img_mask": np.asarray(img_mask), "image_sizes": np.asarray(sizes),
        "text_ids": np.asarray(tids), "text_mask": np.asarray(tmask),
        "targets_key": jax.tree.map(np.asarray, targets_key),
        "targets_ref": jax.tree.map(np.asarray, dict(targets_key)),
    }

    def loader():
        i = 0
        while True:
            yield {**base, "__task__": ("detection" if i % 2 == 0
                                        else "sot")}
            i += 1

    tr = Trainer(cfg, loader(), output_dir="/tmp/route_test",
                 use_mesh=False, video=True, log_period=1)
    tr.train()
    assert int(tr.state.step) == 2
    assert set(tr._steps) == {"detection", "sot"}
