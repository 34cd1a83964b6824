"""Optimizer with the reference's per-group learning rates.

Parity: train_net.py:149-201 — AdamW with
  * backbone params x BACKBONE_MULTIPLIER (0.1)
  * `sampling_offsets` / `reference_points` linear projections x 0.1
  * text encoder at LANG_LR (1e-5)
  * VL fusion layers at VL_LR
  * full-model grad-norm clip 0.1
plus WarmupMultiStepLR (detectron2/solver/lr_scheduler.py:132).

Implemented the optax way: one base schedule, per-leaf multipliers by
parameter-path classification, frozen groups masked to zero updates.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import SolverConfig


def classify_param(path: Tuple[str, ...]) -> str:
    """Map a parameter path to an LR group."""
    name = "/".join(str(p) for p in path)
    if "backbone" in name:
        if any(k in name for k in ("/mean", "/var")) or \
           "/stem" in name or "res2_block" in name:
            return "frozen"
        return "backbone"
    if "bert" in name:
        return "lang"
    if "vl_layer" in name:
        return "vl"
    if "sampling_offsets" in name:
        return "linear_proj"
    return "base"


def lr_schedule(cfg: SolverConfig, kind: str = "multistep"):
    """WarmupMultiStepLR / WarmupCosineLR
    (detectron2/solver/lr_scheduler.py:132,171)."""
    def fn(step):
        warm = jnp.minimum(step / jnp.maximum(cfg.warmup_iters, 1), 1.0)
        warm = cfg.warmup_factor * (1 - warm) + warm  # linear to 1.0
        if kind == "cosine":
            decay = 0.5 * (1 + jnp.cos(jnp.pi * step / cfg.max_iter))
        else:
            decay = jnp.ones(())
            for s in cfg.steps:
                decay = decay * jnp.where(step >= s, cfg.gamma, 1.0)
        return warm * decay
    return fn


def build_optimizer(cfg: SolverConfig, params) -> optax.GradientTransformation:
    sched = lr_schedule(cfg)
    group_lr = {
        "base": cfg.base_lr,
        "backbone": cfg.base_lr * cfg.backbone_multiplier,
        "linear_proj": cfg.base_lr * cfg.linear_proj_multiplier,
        "lang": cfg.lang_lr,
        "vl": cfg.vl_lr,
        "frozen": 0.0,
    }
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: classify_param(tuple(
            p.key if hasattr(p, "key") else str(p) for p in path)), params)

    def make(lr):
        if lr == 0.0:
            return optax.set_to_zero()
        mu_dtype = getattr(cfg, "adam_mu_dtype", None)
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                mu_dtype=mu_dtype),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_schedule(lambda s: -lr * sched(s)),
        )

    tx = optax.multi_transform({k: make(v) for k, v in group_lr.items()}, labels)
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    if getattr(cfg, "grad_accum_steps", 1) > 1:
        # single-chip route to the reference's 32-image global batch: grads
        # average over k micro-steps, then ONE clipped AdamW update — the
        # clip applies to the averaged (full-batch) grad exactly as the
        # reference clips at step time (train_net.py:171-186). Schedules
        # inside tx advance per UPDATE, so warmup/steps/max_iter keep their
        # reference meaning.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx
