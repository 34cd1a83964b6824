#!/usr/bin/env python
"""Tracker-hyperparameter grid search over CACHED detections.

Parity: reference tools_bin/grid_search_bdd.py sweeps TRACK.INIT_SCORE_THR /
TRACK.OBJ_SCORE_THR by re-running FULL model inference per grid point. Here
association (QuasiDenseTracker) is decoupled from detection
(MOTDriver.detect_video), so the sweep re-runs only the numpy association
over per-sequence detection caches and scores each combo with CLEAR-MOT —
seconds instead of GPU-hours for the same search.

Cache format (one .npz per sequence, written by `save_detections` or
`tools/eval_video.py --task mot --dump-dets DIR`):
  n_frames, image_size (h, w), ori_size (h, w)
  select_thr ()                              # floor the dets were cached at
  boxes_{i} (N,4 xyxy), scores_{i} (N,), labels_{i} (N,), embeds_{i} (N,E)
  gt_ids_{i} (G,), gt_boxes_{i} (G,4)        # ground truth, original coords

Grid points with obj_thr < the cached select_thr are rejected: detections
below the dump floor no longer exist in the cache, so those points would
silently evaluate the identical detection set.

Usage:
  python tools/grid_search_track.py out/dets/*.npz \
      --init 0.2:0.7:0.1 --obj 0.2:0.7:0.1 [--metric MOTA]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from uninext_tpu.engine.mot_inference import associate
from uninext_tpu.evaluation.mot_eval import evaluate_mot, pool_mot_metrics


def save_detections(path, raw_frames, image_size, ori_size,
                    gt_frames=None, select_thr=0.0):
    """Write a sequence's detection cache (+ optional gt) as one npz.
    select_thr records the score floor the detections were filtered at."""
    arrs = {"n_frames": np.array(len(raw_frames)),
            "image_size": np.asarray(image_size),
            "ori_size": np.asarray(ori_size),
            "select_thr": np.array(float(select_thr))}
    for i, o in enumerate(raw_frames):
        for k in ("boxes", "scores", "labels", "embeds"):
            arrs[f"{k}_{i}"] = np.asarray(o[k])
    if gt_frames is not None:
        for i, g in enumerate(gt_frames):
            arrs[f"gt_ids_{i}"] = np.asarray(g["ids"])
            arrs[f"gt_boxes_{i}"] = np.asarray(g["boxes"])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrs)


def load_detections(path):
    z = np.load(path)
    n = int(z["n_frames"])
    raw = [{k: z[f"{k}_{i}"] for k in ("boxes", "scores", "labels",
                                       "embeds")} for i in range(n)]
    gt = None
    if f"gt_ids_0" in z:
        gt = [{"ids": z[f"gt_ids_{i}"], "boxes": z[f"gt_boxes_{i}"]}
              for i in range(n)]
    select_thr = float(z["select_thr"]) if "select_thr" in z else 0.0
    return raw, tuple(z["image_size"]), tuple(z["ori_size"]), gt, select_thr


def _parse_range(spec):
    """'0.2:0.7:0.1' -> [0.2, 0.3, ...]; a single float -> [v]."""
    parts = [float(p) for p in spec.split(":")]
    if len(parts) == 1:
        return parts
    lo, hi, step = parts
    return list(np.round(np.arange(lo, hi, step), 6))


def run_grid(seqs, init_thrs, obj_thrs, metric="MOTA",
             cache_select_thr=0.0):
    """seqs: list of (raw_frames, image_size, ori_size, gt_frames).
    Returns (results list sorted best-first, best entry). Combos with
    init <= obj are skipped (same constraint as the reference sweep);
    combos with obj < cache_select_thr raise — those detections were
    filtered out at dump time, so the sweep would silently re-score the
    identical detection set. Metrics are POOLED CLEAR-MOT counts across
    sequences (as eval_bdd / official scorers do), not per-sequence means."""
    bad = [o for o in obj_thrs if o < cache_select_thr - 1e-9]
    if bad:
        raise ValueError(
            f"obj thresholds {bad} are below the caches' select_thr "
            f"{cache_select_thr}: re-dump with a lower floor "
            f"(cfg.track.inference_select_thr) to sweep them")
    results = []
    for init_thr in init_thrs:
        for obj_thr in obj_thrs:
            if init_thr <= obj_thr:
                continue
            per_seq = []
            for raw, image_size, ori_size, gt in seqs:
                pred = associate(raw, image_size, ori_size,
                                 init_score_thr=init_thr,
                                 obj_score_thr=obj_thr)
                pred_frames = [{"ids": [d["id"] for d in dets],
                                "boxes": np.array(
                                    [d["box_xyxy"] for d in dets]
                                ).reshape(-1, 4)}
                               for dets in pred]
                per_seq.append(evaluate_mot(gt, pred_frames))
            pooled = pool_mot_metrics(per_seq)
            entry = {"init_score_thr": init_thr, "obj_score_thr": obj_thr,
                     **{k: pooled[k] for k in
                        ("MOTA", "IDF1", "IDS", "FP", "FN")}}
            results.append(entry)
    results.sort(key=lambda e: -e[metric])
    return results, (results[0] if results else None)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("caches", nargs="+", help="per-sequence .npz caches")
    ap.add_argument("--init", default="0.2:0.7:0.1",
                    help="init_score_thr range lo:hi:step")
    ap.add_argument("--obj", default="0.2:0.7:0.1",
                    help="obj_score_thr range lo:hi:step")
    ap.add_argument("--metric", default="MOTA", choices=("MOTA", "IDF1"))
    args = ap.parse_args()

    seqs = []
    cache_thr = 0.0
    for path in args.caches:
        raw, image_size, ori_size, gt, sel = load_detections(path)
        if gt is None:
            raise SystemExit(f"{path} has no ground truth; dump with gt")
        cache_thr = max(cache_thr, sel)
        seqs.append((raw, image_size, ori_size, gt))

    results, best = run_grid(seqs, _parse_range(args.init),
                             _parse_range(args.obj), args.metric,
                             cache_select_thr=cache_thr)
    print(f"{'init':>6} {'obj':>6} {'MOTA':>8} {'IDF1':>8} "
          f"{'IDS':>5} {'FP':>5} {'FN':>5}")
    for e in results:
        print(f"{e['init_score_thr']:6.2f} {e['obj_score_thr']:6.2f} "
              f"{e['MOTA']:8.4f} {e['IDF1']:8.4f} {e['IDS']:5d} "
              f"{e['FP']:5d} {e['FN']:5d}")
    if best:
        print(f"best ({args.metric}): init={best['init_score_thr']:.2f} "
              f"obj={best['obj_score_thr']:.2f} {args.metric}="
              f"{best[args.metric]:.4f}")


if __name__ == "__main__":
    main()
