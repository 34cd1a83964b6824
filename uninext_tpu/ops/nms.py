"""Fixed-size class-aware greedy NMS, jit-safe.

Parity: torchvision ops.batched_nms as used at inference (uninext_img.py:413,
uninext_vid.py:1137,1241,1404). Greedy order is score-descending; class-aware
via an offset-free same-class mask (identical result to torchvision's
coordinate-offset trick).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import box_ops


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, classes: jnp.ndarray,
                iou_threshold: float, valid: jnp.ndarray | None = None
                ) -> jnp.ndarray:
    """boxes: (N, 4) xyxy; scores: (N,); classes: (N,) int.

    Returns keep: (N,) bool (in original order). Invalid entries never kept.
    """
    N = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    c = classes[order]
    v = valid[order]
    iou, _ = box_ops.box_iou(b, b)
    same_cls = c[:, None] == c[None, :]
    suppress_pair = (iou > iou_threshold) & same_cls          # (N, N)

    def body(i, keep):
        # i-th highest score: kept iff not suppressed by any kept j < i
        sup = (suppress_pair[i] & keep & (jnp.arange(N) < i)).any()
        return keep.at[i].set(~sup & v[i])

    keep_sorted = jax.lax.fori_loop(0, N, body, jnp.zeros((N,), bool))
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)
    return keep
