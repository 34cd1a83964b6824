#!/usr/bin/env python
"""Offline SOT result analysis over the reference's result-file format.

Parity: tools_bin/analysis_results.py (+ external/lib eval toolkit) — reads
a directory of `<vid>.txt` files (x,y,w,h per line, the format SOTDriver /
eval_video.py write via save_sot_results) for one or more trackers, pairs
them with the dataset ground truth (LaSOT-style layouts or a cocovid json),
and prints AUC / P / Pnorm per tracker plus mean per-frame time from the
`<vid>_time.txt` companions when present.

Usage:
  python tools/analyze_sot_results.py --results out/expA out/expB \
      --data-root datasets/LaSOT [--json TNL-2K/test.json]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from uninext_tpu.evaluation.sot_eval import (evaluate_sot,
                                             evaluate_sot_dataset)


def load_gt(args):
    """{video_name: (gt_xywh (T,4), visible (T,) or None)}."""
    gts = {}
    if args.json:
        from uninext_tpu.data.video import load_ytvis_json
        recs, _ = load_ytvis_json(args.json, args.data_root)
        for r in recs:
            t = r["tracks"][0]
            boxes = np.array([b if b is not None else [0, 0, 0, 0]
                              for b in t["bboxes"]], np.float32)
            vis = np.array([b is not None for b in t["bboxes"]])
            name = os.path.basename(
                os.path.dirname(r["file_names"][0])) or f"vid{r['video_id']}"
            gts[name] = (boxes, vis)
        return gts
    from uninext_tpu.data.sot_datasets import load_lasot
    for seq in load_lasot(args.data_root):
        gts[seq["name"]] = (np.asarray(seq["gt_xywh"], np.float32),
                            seq.get("visible"))
    return gts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", nargs="+", required=True,
                    help="one directory of <vid>.txt files per tracker")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--json", default=None,
                    help="cocovid gt json (TNL-2K/GOT10k-style) instead of "
                         "a LaSOT layout")
    args = ap.parse_args()
    gts = load_gt(args)
    if not gts:
        raise SystemExit(f"no ground truth found under {args.data_root}")

    print(f"{'tracker':30s} {'#seq':>5s} {'AUC':>7s} {'P':>7s} "
          f"{'Pnorm':>7s} {'ms/frame':>9s}")
    for rd in args.results:
        per_seq, times = {}, []
        for f in glob.glob(os.path.join(rd, "*.txt")):
            name = os.path.splitext(os.path.basename(f))[0]
            if name.endswith("_time"):
                continue
            if name not in gts:
                continue
            pred = np.loadtxt(f, delimiter=",", ndmin=2)
            gt, vis = gts[name]
            n = min(len(pred), len(gt))
            per_seq[name] = {"pred": pred[:n], "gt": gt[:n],
                             "visible": None if vis is None else vis[:n]}
            tf = os.path.join(rd, f"{name}_time.txt")
            if os.path.exists(tf):
                times.extend(np.loadtxt(tf, ndmin=1).tolist())
        if not per_seq:
            print(f"{os.path.basename(rd.rstrip('/')):30s} {0:5d}     (no "
                  "matching sequences)")
            continue
        m = evaluate_sot_dataset(per_seq)
        t_ms = 1000 * float(np.mean(times)) if times else float("nan")
        print(f"{os.path.basename(rd.rstrip('/')):30s} {len(per_seq):5d} "
              f"{m['AUC']:7.3f} {m['P']:7.3f} {m['Pnorm']:7.3f} {t_ms:9.1f}")


if __name__ == "__main__":
    main()
