"""Set matching on device: exact Hungarian (JV) + simOTA, static shapes.

Parity anchors (reference models/deformable_detr/matcher.py):
  * HungarianMatcherVL.forward     — :449-503 (focal class cost averaged over
    each object's positive tokens + L1 + GIoU, solved by scipy LSA)
  * forward_ota / compute_cost     — :286-342 (cost = cls + 3*giou +
    100*(not in center) + 10000*(not fg))
  * get_in_boxes_info              — :344-385
  * dynamic_k_matching             — :387-447

TPU re-design: the reference ships cost matrices to the host and calls scipy.
Here both matchers run under jit on device with static shapes:
  * Hungarian: the shortest-augmenting-path (Jonker-Volgenant) algorithm —
    the same one scipy.optimize.linear_sum_assignment implements — written
    with lax.while_loop/scan. Padded GT rows get constant cost so they absorb
    leftover queries without disturbing the optimum of valid rows.
  * simOTA: ranks replace data-dependent top-k loops; the conflict-resolution
    while-loop is bounded.
Both return a dense per-query assignment `q2g: (Q,) int32` (gt index or -1),
the natural static-shape form for downstream masked losses.

Note: the reference's dynamic_k_matching reuses a stale `anchor_matching_gt`
mask inside its fix-up while-loop (matcher.py:424-427); we implement the
intended semantics (recompute each iteration) — documented divergence.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils import box_ops

INF = jnp.float32(1e18)


# --------------------------------------------------------------------------
# Exact rectangular LSA (rows R <= cols C), Jonker-Volgenant / scipy algorithm
# --------------------------------------------------------------------------
def _lsa(cost: jnp.ndarray) -> jnp.ndarray:
    """cost: (R, C) fp32 with R <= C. Returns col4row (R,) int32."""
    R, C = cost.shape
    cost = cost.astype(jnp.float32)

    def augment_row(carry, cur_row):
        u, v, col4row, row4col = carry

        def dijkstra_body(st):
            i, min_val, _sink, shortest, path, SC, SR = st
            SR = SR.at[i].set(True)
            reduced = min_val + cost[i] - u[i] - v
            better = (reduced < shortest) & ~SC
            path = jnp.where(better, i, path)
            shortest = jnp.where(better, reduced, shortest)
            masked = jnp.where(SC, INF, shortest)
            j = jnp.argmin(masked)
            min_val = masked[j]
            SC = SC.at[j].set(True)
            nxt = row4col[j]
            sink = jnp.where(nxt == -1, j, -1)
            i = jnp.where(nxt == -1, i, nxt)
            return (i, min_val, sink, shortest, path, SC, SR)

        init = (cur_row, jnp.float32(0.0), jnp.int32(-1),
                jnp.full((C,), INF), jnp.full((C,), -1, jnp.int32),
                jnp.zeros((C,), bool), jnp.zeros((R,), bool))
        i, min_val, sink, shortest, path, SC, SR = jax.lax.while_loop(
            lambda st: st[2] == -1, dijkstra_body, init)

        # dual updates (scipy lsap conventions)
        u = u.at[cur_row].add(min_val)
        others = SR & (jnp.arange(R) != cur_row)
        sp_at_assigned = shortest[jnp.clip(col4row, 0, C - 1)]
        u = jnp.where(others, u + min_val - sp_at_assigned, u)
        v = jnp.where(SC, v + shortest - min_val, v)

        # augment along the alternating path ending at `sink`
        def aug_body(st):
            j, col4row, row4col, _done = st
            i = path[j]
            row4col = row4col.at[j].set(i)
            prev = col4row[i]
            col4row = col4row.at[i].set(j)
            done = i == cur_row
            return (prev, col4row, row4col, done)

        _, col4row, row4col, _ = jax.lax.while_loop(
            lambda st: ~st[3], aug_body,
            (sink, col4row, row4col, jnp.array(False)))
        return (u, v, col4row, row4col), None

    init = (jnp.zeros((R,)), jnp.zeros((C,)),
            jnp.full((R,), -1, jnp.int32), jnp.full((C,), -1, jnp.int32))
    (u, v, col4row, row4col), _ = jax.lax.scan(
        augment_row, init, jnp.arange(R, dtype=jnp.int32))
    return col4row


def hungarian_match(cost: jnp.ndarray, gt_valid: jnp.ndarray) -> jnp.ndarray:
    """cost: (Q, G) fp32; gt_valid: (G,) bool. Returns q2g: (Q,) int32.

    Matches each valid gt to a distinct query minimizing total cost. Invalid
    gt rows are given constant cost (indifferent), so valid rows remain LSA-
    optimal.
    """
    Q, G = cost.shape
    # rows = gts (G <= Q); constant row for invalid gts
    c = jnp.where(gt_valid[:, None], cost.T, 0.0)
    col4row = _lsa(c)                       # (G,) query index per gt
    q2g = jnp.full((Q,), -1, jnp.int32)
    g_idx = jnp.arange(G, dtype=jnp.int32)
    q2g = q2g.at[col4row].set(jnp.where(gt_valid, g_idx, -1), mode="drop")
    return q2g


# --------------------------------------------------------------------------
# VL cost (focal class cost over positive tokens + L1 + GIoU)
# --------------------------------------------------------------------------
def vl_cost_matrix(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                   positive_map: jnp.ndarray, gt_boxes: jnp.ndarray,
                   gt_valid: jnp.ndarray,
                   cost_class: float = 2.0, cost_bbox: float = 5.0,
                   cost_giou: float = 2.0,
                   alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Single-image cost matrix (Q, G).

    pred_logits: (Q, T); pred_boxes: (Q, 4) cxcywh in [0,1];
    positive_map: (G, T) bool; gt_boxes: (G, 4) cxcywh; gt_valid: (G,).
    """
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    neg = (1 - alpha) * prob ** gamma * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    pm = positive_map.astype(jnp.float32)
    denom = jnp.maximum(pm.sum(-1), 1.0)                    # tokens per gt
    cls = jnp.einsum("qt,gt->qg", pos - neg, pm) / denom[None, :]
    l1 = jnp.abs(pred_boxes[:, None] - gt_boxes[None]).sum(-1)
    giou = -box_ops.generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(gt_boxes))
    C = cost_bbox * l1 + cost_class * cls + cost_giou * giou
    return jnp.where(gt_valid[None, :], C, 0.0)


# --------------------------------------------------------------------------
# simOTA
# --------------------------------------------------------------------------
def ota_cost_and_iou(pred_logits, pred_boxes, positive_map, gt_boxes, gt_valid,
                     alpha: float = 0.25, gamma: float = 2.0,
                     expanded_strides: int = 32, center_radius: float = 2.5):
    """OTA cost (Q, G) and pairwise IoU (Q, G) for one image.

    Parity: HungarianMatcherVL.compute_cost / get_in_boxes_info.
    """
    xyxy_gt = box_ops.box_cxcywh_to_xyxy(gt_boxes)
    cx, cy = pred_boxes[:, 0:1], pred_boxes[:, 1:2]
    in_boxes = ((cx > xyxy_gt[None, :, 0]) & (cx < xyxy_gt[None, :, 2]) &
                (cy > xyxy_gt[None, :, 1]) & (cy < xyxy_gt[None, :, 3]))
    r = center_radius / expanded_strides
    in_centers = ((cx > gt_boxes[None, :, 0] - r) & (cx < gt_boxes[None, :, 0] + r) &
                  (cy > gt_boxes[None, :, 1] - r) & (cy < gt_boxes[None, :, 1] + r))
    in_boxes = in_boxes & gt_valid[None, :]
    in_centers = in_centers & gt_valid[None, :]
    fg_mask = (in_boxes | in_centers).any(-1)                 # (Q,)
    is_in_boxes_and_center = in_boxes & in_centers            # (Q, G)

    iou, _ = box_ops.box_iou(box_ops.box_cxcywh_to_xyxy(pred_boxes), xyxy_gt)
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    negc = (1 - alpha) * prob ** gamma * (-jnp.log(1 - prob + 1e-8))
    posc = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    pm = positive_map.astype(jnp.float32)
    denom = jnp.maximum(pm.sum(-1), 1.0)
    cls = jnp.einsum("qt,gt->qg", posc - negc, pm) / denom[None, :]
    giou = -box_ops.generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes), xyxy_gt)
    cost = cls + 3.0 * giou + 100.0 * (~is_in_boxes_and_center)
    cost = cost + 10000.0 * (~fg_mask[:, None])
    cost = jnp.where(gt_valid[None, :], cost, INF)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    return cost, iou


def simota_match(cost: jnp.ndarray, ious: jnp.ndarray, gt_valid: jnp.ndarray,
                 n_candidate_k: int = 10, max_fixup_iters: int = 50
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic-k many-to-one matching.

    Returns (q2g (Q,) int32 gt-or--1, g2q_best (G,) int32 best query per gt).
    """
    Q, G = cost.shape
    # dynamic k per gt = clamp(int(sum of top-10 ious), 1)
    topk_ious = jax.lax.top_k(ious.T, min(Q, n_candidate_k))[0]   # (G, k)
    dynamic_ks = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, None)

    # rank of each query within each gt column by ascending cost
    order = jnp.argsort(cost, axis=0)                              # (Q, G)
    ranks = jax.vmap(lambda o: jnp.zeros((Q,), jnp.int32).at[o].set(
        jnp.arange(Q, dtype=jnp.int32)), in_axes=1, out_axes=1)(order)
    matching = ranks < dynamic_ks[None, :]                         # (Q, G)
    matching = matching & gt_valid[None, :]

    def dedup(matching):
        # queries matched to >1 gt keep only their argmin-cost gt
        multi = matching.sum(-1) > 1
        best_g = jnp.argmin(jnp.where(matching, cost, INF), axis=-1)
        onehot = jax.nn.one_hot(best_g, G, dtype=bool)
        return jnp.where(multi[:, None], onehot & matching, matching)

    matching = dedup(matching)

    def fixup_cond(st):
        matching, it = st
        unmatched = gt_valid & (matching.sum(0) == 0)
        return unmatched.any() & (it < max_fixup_iters)

    def fixup_body(st):
        matching, it = st
        matched_q = matching.any(-1)
        adj_cost = cost + 100000.0 * matched_q[:, None]
        unmatched_g = gt_valid & (matching.sum(0) == 0)
        pick = jnp.argmin(adj_cost, axis=0)                        # (G,)
        add = jax.nn.one_hot(pick, Q, dtype=bool).T & unmatched_g[None, :]
        return dedup(matching | add), it + 1

    matching, _ = jax.lax.while_loop(fixup_cond, fixup_body,
                                     (matching, jnp.int32(0)))

    q2g = jnp.where(matching.any(-1),
                    jnp.argmax(matching, axis=-1).astype(jnp.int32), -1)
    # best (min-cost) matched query per gt
    g_cost = jnp.where(matching, cost, INF)
    g2q_best = jnp.argmin(g_cost, axis=0).astype(jnp.int32)
    g2q_best = jnp.where(gt_valid, g2q_best, -1)
    return q2g, g2q_best
