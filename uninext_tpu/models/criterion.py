"""Set-prediction losses with static shapes (masked, fully on-device).

Parity anchors (reference models/deformable_detr/deformable_detr.py):
  * loss_labelsVL  — :324-351 (token-level sigmoid focal vs positive-map
                     one-hot; /num_boxes, matched count when OTA)
  * loss_boxes     — :368-408 (L1 + GIoU over matched pairs; IoU-branch BCE)
  * loss_masks     — :410-455 (focal mean-over-pixels + dice, /num_matched)
  * token_sigmoid_binary_focal_loss — segmentation.py:120-167
  * encoder (binary) losses — :627-652
  * num_boxes all-reduce — :599-603 (with pjit global arrays, plain sums are
    already global — no explicit collective needed)

Static-shape contract: every target tensor is padded to (B, G=max_insts, ...)
with a validity mask; every matching is a dense per-query map q2g (B, Q) with
-1 for unmatched. All reductions are masked sums — no boolean indexing.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import LossConfig
from ..utils import box_ops


def sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Elementwise focal loss (no reduction)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable BCE-with-logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def dice_loss_elem(logits, targets, valid=None):
    """Per-instance dice loss; logits/targets: (..., N, P)."""
    probs = jax.nn.sigmoid(logits)
    if valid is not None:
        probs = probs * valid
        targets = targets * valid
    num = 2 * (probs * targets).sum(-1)
    den = probs.sum(-1) + targets.sum(-1)
    return 1 - (num + 1) / (den + 1)


def gather_by_match(x: jnp.ndarray, q2g: jnp.ndarray) -> jnp.ndarray:
    """x: (B, G, ...); q2g: (B, Q) -> (B, Q, ...) gathered, garbage where -1."""
    idx = jnp.clip(q2g, 0).reshape(*q2g.shape, *([1] * (x.ndim - 2)))
    return jnp.take_along_axis(x, idx, axis=1)


def loss_labels_vl(pred_logits: jnp.ndarray, positive_map: jnp.ndarray,
                   q2g: jnp.ndarray, text_mask: jnp.ndarray,
                   num_boxes: jnp.ndarray, cfg: LossConfig) -> jnp.ndarray:
    """pred_logits (B,Q,T); positive_map (B,G,T) float {0,1}; q2g (B,Q);
    text_mask (B,T) 1=valid."""
    matched = (q2g >= 0)[..., None]
    target = gather_by_match(positive_map.astype(jnp.float32), q2g)
    target = jnp.where(matched, target, 0.0)
    loss = sigmoid_focal_loss(pred_logits.astype(jnp.float32), target,
                              cfg.focal_alpha, cfg.focal_gamma)
    if text_mask is not None:
        loss = loss * text_mask[:, None, :].astype(loss.dtype)
    return loss.sum() / num_boxes


def loss_boxes(pred_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
               q2g: jnp.ndarray, num_boxes: jnp.ndarray,
               pred_boxious: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """pred_boxes (B,Q,4) cxcywh; gt_boxes (B,G,4); q2g (B,Q)."""
    matched = (q2g >= 0).astype(jnp.float32)
    tgt = gather_by_match(gt_boxes, q2g)
    pred = pred_boxes.astype(jnp.float32)
    l1 = jnp.abs(pred - tgt).sum(-1) * matched
    giou = box_ops.elementwise_giou_loss(
        box_ops.box_cxcywh_to_xyxy(pred),
        box_ops.box_cxcywh_to_xyxy(tgt)) * matched
    out = {"loss_bbox": l1.sum() / num_boxes,
           "loss_giou": giou.sum() / num_boxes}
    if pred_boxious is not None:
        iou_tgt = jax.lax.stop_gradient(box_ops.elementwise_box_iou(
            box_ops.box_cxcywh_to_xyxy(pred),
            box_ops.box_cxcywh_to_xyxy(tgt)))
        bce = optax_sigmoid_ce(pred_boxious[..., 0].astype(jnp.float32), iou_tgt)
        out["loss_boxiou"] = (bce * matched).sum() / jnp.maximum(matched.sum(), 1.0)
    return out


def loss_masks(pred_masks: jnp.ndarray, target_masks: jnp.ndarray,
               sel_valid: jnp.ndarray, num_boxes: jnp.ndarray,
               cfg: LossConfig) -> Dict[str, jnp.ndarray]:
    """pred_masks (B,N,H,W) logits for selected instances; target_masks
    (B,N,H,W) in {0,1}; sel_valid (B,N)."""
    B, N = pred_masks.shape[:2]
    pred = pred_masks.reshape(B, N, -1).astype(jnp.float32)
    tgt = target_masks.reshape(B, N, -1).astype(jnp.float32)
    v = sel_valid.astype(jnp.float32)
    focal = sigmoid_focal_loss(pred, tgt, cfg.focal_alpha, cfg.focal_gamma)
    focal = focal.mean(-1) * v              # per-instance pixel mean
    dice = dice_loss_elem(pred, tgt) * v
    return {"loss_mask": focal.sum() / num_boxes,
            "loss_dice": dice.sum() / num_boxes}


def unfold_wo_center(x: jnp.ndarray, kernel_size: int = 3,
                     dilation: int = 2) -> jnp.ndarray:
    """x: (..., H, W) -> (..., K, H, W) with K = k*k-1 neighbors (zero pad).

    Parity: reference unfold_wo_center (deformable_detr.py:787-810)."""
    k, d = kernel_size, dilation
    pad = (k + (d - 1) * (k - 1)) // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)])
    H, W = x.shape[-2:]
    shifts = []
    for dy in range(k):
        for dx in range(k):
            if dy == k // 2 and dx == k // 2:
                continue
            oy, ox = dy * d, dx * d
            shifts.append(xp[..., oy:oy + H, ox:ox + W])
    return jnp.stack(shifts, axis=-3)


def loss_masks_boxinst(mask_logits: jnp.ndarray, box_bitmasks: jnp.ndarray,
                       color_similarity: jnp.ndarray, sel_valid: jnp.ndarray,
                       warmup_factor: jnp.ndarray,
                       pairwise_color_thresh: float = 0.3,
                       pairwise_size: int = 3, pairwise_dilation: int = 2
                       ) -> Dict[str, jnp.ndarray]:
    """Box-supervised mask losses (BoxInst).

    mask_logits: (B, N, H, W) selected-instance logits;
    box_bitmasks: (B, N, H, W) gt box rasterizations (the only supervision);
    color_similarity: (B, 8, H, W) per-image neighbor color similarity;
    sel_valid: (B, N). Parity: loss_masks_boxinst (deformable_detr.py:457-527)
    with compute_project_term :812 and compute_pairwise_term :824."""
    v = sel_valid.astype(jnp.float32)[..., None, None]
    scores = jax.nn.sigmoid(mask_logits.astype(jnp.float32)) * v
    bitmasks = box_bitmasks.astype(jnp.float32) * v

    def dice(x, y):
        x = x.reshape(*x.shape[:2], -1)
        y = y.reshape(*y.shape[:2], -1)
        inter = (x * y).sum(-1)
        union = (x ** 2).sum(-1) + (y ** 2).sum(-1) + 1e-5
        return 1.0 - 2 * inter / union

    proj_x = dice(scores.max(axis=2, keepdims=True),
                  bitmasks.max(axis=2, keepdims=True))
    proj_y = dice(scores.max(axis=3, keepdims=True),
                  bitmasks.max(axis=3, keepdims=True))
    n = jnp.maximum(sel_valid.sum(), 1.0)
    loss_prj = (((proj_x + proj_y) * sel_valid).sum()) / n

    log_fg = jax.nn.log_sigmoid(mask_logits.astype(jnp.float32))
    log_bg = jax.nn.log_sigmoid(-mask_logits.astype(jnp.float32))
    fg_un = unfold_wo_center(log_fg, pairwise_size, pairwise_dilation)
    bg_un = unfold_wo_center(log_bg, pairwise_size, pairwise_dilation)
    same_fg = log_fg[:, :, None] + fg_un
    same_bg = log_bg[:, :, None] + bg_un
    mx = jnp.maximum(same_fg, same_bg)
    log_same = jnp.log(jnp.exp(same_fg - mx) + jnp.exp(same_bg - mx)) + mx
    pairwise = -log_same                                   # (B, N, 8, H, W)
    weights = ((color_similarity[:, None] >= pairwise_color_thresh)
               .astype(jnp.float32) * bitmasks[:, :, None])
    loss_pairwise = ((pairwise * weights).sum()
                     / jnp.clip(weights.sum(), 1.0)) * warmup_factor
    return {"loss_prj": loss_prj, "loss_pairwise": loss_pairwise}


def loss_reid_static(contrast: jnp.ndarray, labels3: jnp.ndarray,
                     row_valid: jnp.ndarray, cos_sim: jnp.ndarray
                     ) -> Dict[str, jnp.ndarray]:
    """Static-shape contrastive reid loss.

    contrast: (R, Q) raw dot products (rows = key-frame gt instances,
    cols = all ref-frame queries); labels3: (R, Q) in {1 pos, 0 neg,
    -1 excluded}; row_valid: (R,); cos_sim: (R, Q) cosine similarities.

    Parity: loss_reid (deformable_detr.py:529-565) + select_pos_neg
    (pos_neg_select.py:15-96). The aux term deviates from the reference's
    random 10x-negative sampling: negatives are weighted so their total
    weight matches the sampled count in expectation (deterministic).
    """
    pos = labels3 == 1
    neg = labels3 == 0
    row_valid = row_valid.astype(jnp.float32)
    rv = row_valid[:, None] > 0
    R, Q = contrast.shape
    pred_pos = jnp.where(pos & rv, contrast, jnp.inf)
    pred_neg = jnp.where(neg & rv, contrast, -jnp.inf)
    diff = (pred_neg[:, None, :] - pred_pos[:, :, None]).reshape(R, Q * Q)
    diff = jnp.concatenate([diff, jnp.zeros((R, 1))], axis=-1)
    contras = jax.nn.logsumexp(diff, axis=-1)
    n = jnp.maximum(row_valid.sum(), 1.0)
    loss_contrast = (contras * row_valid).sum() / n

    # aux: (cos - label)^2 weighted mean; negatives down-weighted to
    # ~10x the positive count as in the reference's sampling
    n_pos = jnp.maximum(pos.sum(-1), 1)
    n_neg = jnp.maximum(neg.sum(-1), 1)
    w_neg = jnp.minimum(1.0, 10.0 * n_pos / n_neg)[:, None]
    w = jnp.where(pos, 1.0, jnp.where(neg, w_neg, 0.0))
    err = (cos_sim - pos.astype(jnp.float32)) ** 2
    aux_per_row = (err * w).sum(-1) / jnp.maximum(w.sum(-1), 1e-6)
    loss_aux = (aux_per_row * row_valid).sum() / n
    return {"loss_reid": loss_contrast, "loss_reid_aux": loss_aux}


