"""Fixed-size class-aware greedy NMS, jit-safe and TPU-fast.

Parity: torchvision ops.batched_nms as used at inference (uninext_img.py:413,
uninext_vid.py:1137,1241,1404). Greedy order is score-descending; class-aware
via a same-class mask (identical result to torchvision's coordinate-offset
trick).

TPU design: greedy NMS is a triangular fixpoint
    keep[i] = NOT any_{j<i} (keep[j] AND iou[i,j] > thr AND cls[i] == cls[j])
A sequential fori_loop over 900 boxes costs ~1 ms/iteration on TPU (measured
~800 ms/frame); instead we Jacobi-iterate the whole keep vector with one
(N, N) masked matvec per step. Rows whose suppression chain has depth <= k
are exact after k iterations, so iterating to convergence (lax.while_loop,
bounded by N) yields exactly the greedy result — real chains are < 10 deep,
so this converges in a handful of cheap vectorized steps.
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
    tri = jnp.tril(jnp.ones((N, N), bool), k=-1)       # j < i (score order)
    suppress = ((iou > iou_threshold) & same_cls & tri
                & v[None, :] & v[:, None]).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return (it < N) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        killed = (suppress @ keep.astype(jnp.float32)) > 0
        return (~killed & v, keep, it + 1)

    init_keep = v
    keep_sorted, _, _ = jax.lax.while_loop(
        cond, body, (init_keep, jnp.zeros((N,), bool), jnp.int32(0)))
    return jnp.zeros((N,), bool).at[order].set(keep_sorted)
