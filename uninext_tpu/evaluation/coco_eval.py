"""COCO mAP evaluation (host-side, self-contained).

Replaces the reference's COCOEvaluator + COCOeval_opt
(detectron2/evaluation/coco_evaluation.py, layers/csrc/cocoeval/ — SURVEY N5)
with a vectorized numpy implementation of the standard COCOeval protocol:
greedy score-ordered IoU matching per (image, category), 10 IoU thresholds
.5:.05:.95, 101-point interpolated PR curves, area ranges, maxDets=100.
A C++ drop-in (evaluation/cocoeval_cpp) accelerates the hot matching loop.

Also implements the RefCOCO metrics (P@0.5 / oIoU) from
detectron2/evaluation/coco_evaluation.py:407 `_derive_refcoco_results`.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {"all": (0.0, 1e10), "small": (0.0, 32.0 ** 2),
             "medium": (32.0 ** 2, 96.0 ** 2), "large": (96.0 ** 2, 1e10)}


def box_iou_xyxy(d: np.ndarray, g: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) -> (N,M)"""
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    lt = np.maximum(d[:, None, :2], g[None, :, :2])
    rb = np.minimum(d[:, None, 2:], g[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    return inter / np.maximum(area_d[:, None] + area_g[None] - inter, 1e-9)


def _match_one(ious: np.ndarray, n_gt: int):
    """Greedy COCO matching for one (img, cat): ious (n_det, n_gt) with dets
    pre-sorted by descending score. Returns det_match (n_det, n_thr) of gt
    index or -1."""
    n_det = ious.shape[0]
    T = len(IOU_THRS)
    det_match = np.full((n_det, T), -1, np.int64)
    for ti, thr in enumerate(IOU_THRS):
        taken = np.zeros(n_gt, bool)
        for di in range(n_det):
            best, best_iou = -1, thr
            for gi in range(n_gt):
                if taken[gi]:
                    continue
                if ious[di, gi] >= best_iou:
                    best, best_iou = gi, ious[di, gi]
            if best >= 0:
                taken[best] = True
                det_match[di, ti] = best
    return det_match


class COCOEvaluator:
    """Accumulates per-image predictions; computes AP/AP50/AP75/APs/m/l.

    predictions: per image, dict(image_id, boxes (N,4) xyxy abs, scores (N,),
    classes (N,) contiguous ids, [masks: list of (H,W) bool]).
    ground truth: same layout with `areas` from the annotations.
    """

    def __init__(self, iou_type: str = "bbox", max_dets: int = 100):
        self.iou_type = iou_type
        self.max_dets = max_dets
        self._preds: List[Dict] = []
        self._gts: List[Dict] = []

    def add(self, gt: Dict, pred: Dict):
        self._gts.append(gt)
        self._preds.append(pred)

    def _iou(self, pred, gt):
        if self.iou_type == "bbox":
            return box_iou_xyxy(pred["boxes"], gt["boxes"])
        from ..data.masks import mask_iou
        if len(pred.get("masks", [])) == 0 or len(gt.get("masks", [])) == 0:
            return np.zeros((len(pred["boxes"]), len(gt["boxes"])))
        return mask_iou(np.stack(pred["masks"]), np.stack(gt["masks"]))

    def evaluate(self) -> Dict[str, float]:
        cats = sorted({int(c) for g in self._gts for c in g["classes"]})
        T, R, K, A = len(IOU_THRS), len(RECALL_THRS), len(cats), len(AREA_RNGS)
        precision = -np.ones((T, R, K, A))
        recall = -np.ones((T, K, A))

        for ki, cat in enumerate(cats):
            # gather per-image matches for this category
            per_area = {a: {"scores": [], "tp": [], "n_gt": 0, "ignore": []}
                        for a in AREA_RNGS}
            entries = []
            for gt, pred in zip(self._gts, self._preds):
                g_sel = np.asarray(gt["classes"]) == cat
                p_sel = np.asarray(pred["classes"]) == cat
                g = {k: np.asarray(v)[g_sel] for k, v in gt.items()
                     if k not in ("image_id",) and not np.isscalar(v)}
                p = {k: (np.asarray(v)[p_sel] if k != "masks" else
                         [m for m, s in zip(v, p_sel) if s])
                     for k, v in pred.items()
                     if k not in ("image_id",) and not np.isscalar(v)}
                order = np.argsort(-p["scores"])[:self.max_dets]
                p = {k: (v[order] if k != "masks" else [v[i] for i in order])
                     for k, v in p.items()}
                ious = self._iou(p, g)
                det_match = _match_one(ious, len(g["boxes"]))
                entries.append((g, p, det_match))

            for ai, (aname, (lo, hi)) in enumerate(AREA_RNGS.items()):
                scores_all, tp_all = [], []
                n_gt = 0
                for g, p, det_match in entries:
                    g_area = g.get("areas")
                    if g_area is None:
                        g_area = ((g["boxes"][:, 2] - g["boxes"][:, 0]) *
                                  (g["boxes"][:, 3] - g["boxes"][:, 1]))
                    g_ignore = (g_area < lo) | (g_area > hi)
                    n_gt += int((~g_ignore).sum())
                    if len(p["boxes"]) == 0:
                        continue
                    p_area = ((p["boxes"][:, 2] - p["boxes"][:, 0]) *
                              (p["boxes"][:, 3] - p["boxes"][:, 1]))
                    # det is ignored if matched to ignored gt, or unmatched
                    # and outside the area range
                    tp = np.zeros((len(IOU_THRS), len(p["boxes"])))
                    ignore_det = np.zeros_like(tp, bool)
                    for ti in range(len(IOU_THRS)):
                        m = det_match[:, ti]
                        matched = m >= 0
                        tp[ti] = matched
                        ig = np.where(matched, g_ignore[np.clip(m, 0, None)],
                                      (p_area < lo) | (p_area > hi))
                        ignore_det[ti] = ig
                    scores_all.append(np.tile(p["scores"], (len(IOU_THRS), 1)))
                    tp_all.append(np.where(ignore_det, np.nan, tp))
                if n_gt == 0:
                    continue
                if not scores_all:
                    recall[:, ki, ai] = 0
                    precision[:, :, ki, ai] = 0
                    continue
                scores_cat = np.concatenate(scores_all, 1)   # (T, D)
                tp_cat = np.concatenate(tp_all, 1)
                for ti in range(len(IOU_THRS)):
                    order = np.argsort(-scores_cat[ti], kind="mergesort")
                    tps = tp_cat[ti][order]
                    keep = ~np.isnan(tps)
                    tps = tps[keep]
                    tp_cum = np.cumsum(tps)
                    fp_cum = np.cumsum(1 - tps)
                    rc = tp_cum / n_gt
                    pr = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
                    # monotone precision envelope
                    for i in range(len(pr) - 1, 0, -1):
                        pr[i - 1] = max(pr[i - 1], pr[i])
                    recall[ti, ki, ai] = rc[-1] if len(rc) else 0
                    idx = np.searchsorted(rc, RECALL_THRS, side="left")
                    prec_at = np.zeros(len(RECALL_THRS))
                    ok = idx < len(pr)
                    prec_at[ok] = pr[idx[ok]]
                    precision[ti, :, ki, ai] = prec_at

        def mean_ap(t=None, area="all"):
            ai = list(AREA_RNGS).index(area)
            p = precision[:, :, :, ai]
            if t is not None:
                p = p[[int(round((t - 0.5) / 0.05))]]
            valid = p > -1
            return float(p[valid].mean()) if valid.any() else float("nan")

        return {
            "AP": mean_ap(), "AP50": mean_ap(0.5), "AP75": mean_ap(0.75),
            "APs": mean_ap(area="small"), "APm": mean_ap(area="medium"),
            "APl": mean_ap(area="large"),
        }


def refcoco_metrics(pred_boxes: np.ndarray, gt_boxes: np.ndarray
                    ) -> Dict[str, float]:
    """REC metrics: Precision@0.5 and overall IoU over top-1 predictions.

    pred_boxes/gt_boxes: (N, 4) xyxy, one pair per expression.
    Parity: _derive_refcoco_results (coco_evaluation.py:407)."""
    ious = np.array([box_iou_xyxy(pred_boxes[i:i + 1], gt_boxes[i:i + 1])[0, 0]
                     for i in range(len(gt_boxes))])
    lt = np.maximum(pred_boxes[:, :2], gt_boxes[:, :2])
    rb = np.minimum(pred_boxes[:, 2:], gt_boxes[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = (wh[:, 0] * wh[:, 1]).sum()
    area_p = ((pred_boxes[:, 2] - pred_boxes[:, 0]) *
              (pred_boxes[:, 3] - pred_boxes[:, 1])).sum()
    area_g = ((gt_boxes[:, 2] - gt_boxes[:, 0]) *
              (gt_boxes[:, 3] - gt_boxes[:, 1])).sum()
    return {"P@0.5": float((ious > 0.5).mean()),
            "oIoU": float(inter / max(area_p + area_g - inter, 1e-9)),
            "mIoU": float(ious.mean())}
