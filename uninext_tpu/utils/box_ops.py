"""Box utilities (jnp, fully batched / jit-safe).

Functional parity targets: reference `uninext/util/box_ops.py` (cxcywh<->xyxy,
pairwise IoU / generalized IoU). All functions accept arbitrary leading batch
dims and never branch on data.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; shape [..., 4] -> [...]."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU of xyxy boxes: [..., N, 4] x [..., M, 4] -> ([..., N, M], union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes: [..., N, 4] x [..., M, 4] -> [..., N, M].

    Unlike the reference we never assert on degenerate boxes; padded rows are
    masked by the caller.
    """
    iou, union = box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-9)


def elementwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise (paired) IoU of xyxy boxes: [..., 4] x [..., 4] -> [...].

    Parity: reference `compute_box_iou` (deformable_detr.py:853-869, diagonal).
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-9)


def elementwise_giou_loss(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Paired GIoU loss (1 - GIoU): [..., 4] x [..., 4] -> [...].

    Parity: fvcore `giou_loss` used at deformable_detr.py:401.
    """
    iou = elementwise_box_iou(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    lt_c = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = jnp.clip(rb_c - lt_c, 0)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    giou = iou - (area_c - union) / jnp.maximum(area_c, 1e-9)
    return 1.0 - giou
