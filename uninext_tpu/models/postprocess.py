"""Device-side inference postprocessing.

Parity: UNINEXT_IMG.inference (uninext_img.py:367-485) —
grounding->OD logit conversion (MEAN over each class's tokens, :598-610),
IoU-aware score sqrt(sigmoid(cls) * sigmoid(iou)), class-aware NMS(0.7) on the
OTA path, then top-k (100 detection / 1 grounding). Everything is jitted with
static shapes; final resize-to-original happens in the evaluator on host.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms
from ..utils import box_ops


def grounding_to_od_logits(logits: jnp.ndarray,
                           cls_token_map: jnp.ndarray) -> jnp.ndarray:
    """logits: (B, Q, T); cls_token_map: (C, T) bool -> (B, Q, C) mean over
    each class's tokens."""
    m = cls_token_map.astype(jnp.float32)
    denom = jnp.maximum(m.sum(-1), 1.0)
    return jnp.einsum("bqt,ct->bqc", logits.astype(jnp.float32), m) / denom


def postprocess_detection(outputs: Dict[str, jnp.ndarray],
                          cls_token_map: jnp.ndarray,
                          max_inst: int = 100,
                          use_nms: bool = True,
                          nms_threshold: float = 0.7,
                          score_threshold: float = 0.0):
    """Returns dict(boxes (B,K,4) normalized xyxy, scores (B,K),
    classes (B,K), query_idx (B,K)) with K = max_inst."""
    logits = grounding_to_od_logits(outputs["pred_logits"], cls_token_map)
    prob = jax.nn.sigmoid(logits)
    if "pred_boxious" in outputs:
        iou = jax.nn.sigmoid(outputs["pred_boxious"].astype(jnp.float32))
        prob = jnp.sqrt(prob * iou)
    boxes_xyxy = box_ops.box_cxcywh_to_xyxy(outputs["pred_boxes"])
    B, Q, C = prob.shape

    if use_nms:
        nms_scores = prob.max(-1)
        nms_classes = prob.argmax(-1)
        keep = jax.vmap(batched_nms, (0, 0, 0, None))(
            boxes_xyxy, nms_scores, nms_classes, nms_threshold)
        prob = jnp.where(keep[..., None], prob, -1.0)
    if score_threshold > 0.0:
        prob = jnp.where(prob > score_threshold, prob, -1.0)

    flat = prob.reshape(B, Q * C)
    k = min(max_inst, Q * C)
    scores, idx = jax.lax.top_k(flat, k)
    query_idx = (idx // C).astype(jnp.int32)
    classes = (idx % C).astype(jnp.int32)
    sel_boxes = jnp.take_along_axis(boxes_xyxy, query_idx[..., None], axis=1)
    return {"boxes": sel_boxes, "scores": scores, "classes": classes,
            "query_idx": query_idx}
