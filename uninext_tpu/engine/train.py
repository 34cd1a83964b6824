"""Jitted SPMD train step + TrainState.

Replaces the reference's SimpleTrainer/AMPTrainer step
(detectron2/engine/train_loop.py:258,382): data -> loss dict -> weighted sum
-> backward -> clip -> AdamW step, with DDP's gradient all-reduce replaced by
XLA-inserted collectives from sharding annotations (batch over the "data"
mesh axis, params replicated). AMP is unnecessary: compute already runs in
bfloat16 with fp32 params/optimizer state, no loss scaling needed on TPU.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import UninextConfig
from ..models.detr import UninextDETR
from .optimizer import build_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def loss_weights(cfg: UninextConfig) -> Dict[str, float]:
    """Weight table; unknown keys (e.g. loss_boxiou) default to 1.0.

    Parity: uninext_img.py:161-176 weight_dict (aux layers share weights; dn
    losses use class/l1/giou weights)."""
    l = cfg.loss
    return {"loss_ce": l.class_weight, "loss_bbox": l.l1_weight,
            "loss_giou": l.giou_weight, "loss_mask": l.mask_weight,
            "loss_dice": l.dice_weight, "loss_reid": l.reid_weight,
            "loss_reid_aux": l.reid_weight}


def weighted_total(losses: Dict[str, jnp.ndarray],
                   weights: Dict[str, float],
                   task_weight: float = 1.0) -> jnp.ndarray:
    total = jnp.zeros(())
    for k, v in losses.items():
        # longest matching key wins: "loss_reid_aux" must match its own
        # entry, not the "loss_reid" prefix (aux-layer suffixed keys like
        # "loss_ce_3" still fall through to their base weight)
        base = k
        best = -1
        for key in weights:
            if (k == key or k.startswith(key + "_")) and len(key) > best:
                base, best = key, len(key)
        total = total + v * weights.get(base, 1.0) * task_weight
    return total


def create_train_state(cfg: UninextConfig, rng: jax.Array,
                       sample_batch: Dict[str, jnp.ndarray],
                       task: str = "detection",
                       has_masks: bool = True,
                       mesh: Mesh | None = None,
                       tp: bool = False) -> Tuple[UninextDETR, TrainState]:
    model = UninextDETR(cfg)
    targets = {k: v for k, v in sample_batch["targets"].items()
               if k != "has_masks"}
    targets["has_masks"] = has_masks
    # jit the init: eager flax init executes op-by-op (minutes on CPU) and
    # bypasses the persistent compilation cache. has_masks is static —
    # keep it out of the traced pytree.
    traced_targets = {k: v for k, v in targets.items() if k != "has_masks"}
    init_fn = jax.jit(lambda r, b, t: model.init(
        {"params": r, "dn": jax.random.fold_in(r, 1),
         "droppath": jax.random.fold_in(r, 7)},
        b["images"], b["img_mask"], b["image_sizes"], b["text_ids"],
        b["text_mask"], task=task, targets={**t, "has_masks": has_masks},
        train=True))
    params = init_fn(rng, sample_batch, traced_targets)["params"]
    tx = build_optimizer(cfg.solver, params)
    opt_state = tx.init(params)
    if tp and mesh is not None and mesh.shape.get("model", 1) > 1:
        # Megatron-style TP of the heavy towers (parallel/sharding.py):
        # params AND Adam mu/nu redistribute onto the "model" axis
        from ..parallel.sharding import shard_tree
        params = shard_tree(params, mesh)
        opt_state = shard_tree(opt_state, mesh)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state, tx=tx)
    return model, state


def make_train_step(model: UninextDETR, cfg: UninextConfig, task: str,
                    mesh: Mesh | None = None, has_masks: bool = True,
                    tp: bool = False):
    """`has_masks` is static (compiled into the step); the batch pytree must
    contain only arrays — no python scalars (sharding annotations apply to
    every leaf). With `tp`, the state must arrive committed to its
    tensor-parallel shardings (create_train_state(..., tp=True)); the jit
    inherits them instead of forcing replication."""
    weights = loss_weights(cfg)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array):
        targets = {k: v for k, v in batch["targets"].items()
                   if k != "has_masks"}
        targets["has_masks"] = has_masks
        if cfg.loss.boxinst:
            # pairwise-loss warmup reads the training step (the reference
            # criterion counts its own forward calls, deformable_detr.py:521)
            targets["step"] = state.step

        def loss_fn(params):
            losses = model.apply(
                {"params": params}, batch["images"], batch["img_mask"],
                batch["image_sizes"], batch["text_ids"], batch["text_mask"],
                task=task, targets=targets, train=True,
                rngs={"dn": rng,
                      "droppath": jax.random.fold_in(rng, 7)})
            return weighted_total(losses, weights), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        metrics = {"total_loss": total, **losses}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    if tp:
        # None = inherit the argument's committed (TP) shardings
        return jax.jit(step_fn,
                       in_shardings=(None, batch_sharding, repl),
                       donate_argnums=0)
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_sharding, repl),
        out_shardings=(repl, repl),
        donate_argnums=0)


def make_video_train_step(model: UninextDETR, cfg: UninextConfig,
                          mesh: Mesh | None = None, has_masks: bool = True,
                          task: str = "detection"):
    """Stage-3 two-frame (key, ref) step. task="detection"/"grounding":
    detection losses on the key frame + contrastive reid against the ref
    frame (reference DDETRSegmUniVID.coco_forward_vis). task="sot": the ref
    frame contributes only the template crop prompt, no reid
    (coco_forward_sot). Batch layout = data.video.collate_video."""
    weights = loss_weights(cfg)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray],
                rng: jax.Array):
        def tgt(t):
            out = {k: v for k, v in t.items() if k != "has_masks"}
            out["has_masks"] = has_masks
            return out

        def loss_fn(params):
            rngs = {"dn": rng, "droppath": jax.random.fold_in(rng, 7)}
            if task == "sot":
                losses = model.apply(
                    {"params": params}, batch["images_key"],
                    batch["img_mask"], batch["image_sizes"],
                    tgt(batch["targets_key"]), tgt(batch["targets_ref"]),
                    batch["images_ref"], rngs=rngs,
                    method=UninextDETR.forward_sot_train)
            else:
                losses = model.apply(
                    {"params": params}, batch["images_key"],
                    batch["img_mask"], batch["image_sizes"],
                    batch["text_ids"], batch["text_mask"],
                    tgt(batch["targets_key"]), tgt(batch["targets_ref"]),
                    batch["images_ref"], task=task, rngs=rngs,
                    method=UninextDETR.forward_video_train)
            scale = cfg.loss.sot_loss_scale if task == "sot" else 1.0
            return weighted_total(losses, weights, task_weight=scale), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"total_loss": total, **losses}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(step_fn,
                   in_shardings=(repl, batch_sharding, repl),
                   out_shardings=(repl, repl), donate_argnums=0)


def create_video_train_state(cfg: UninextConfig, rng: jax.Array,
                             sample_batch: Dict[str, jnp.ndarray],
                             has_masks: bool = True, task: str = "detection",
                             init_all: bool = False
                             ) -> Tuple[UninextDETR, TrainState]:
    model = UninextDETR(cfg)

    def tgt(t):
        out = {k: v for k, v in t.items() if k != "has_masks"}
        out["has_masks"] = has_masks
        return out

    if task == "sot" or init_all:
        # the sot path exercises the template branch (template backbone,
        # adjust_layer, sot_fuser); init every branch so checkpoints from
        # mixed-task stage-3 training are complete regardless of task order
        from ..models.detr import init_all_paths
        params = init_all_paths(model, rng)["params"]
    else:
        init_fn = jax.jit(lambda r, b: model.init(
            {"params": r, "dn": jax.random.fold_in(r, 1),
             "droppath": jax.random.fold_in(r, 7)},
            b["images_key"], b["img_mask"], b["image_sizes"], b["text_ids"],
            b["text_mask"], tgt(b["targets_key"]), tgt(b["targets_ref"]),
            b["images_ref"], task=task,
            method=UninextDETR.forward_video_train))
        params = init_fn(rng, sample_batch)["params"]
    tx = build_optimizer(cfg.solver, params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), tx=tx)
    return model, state
