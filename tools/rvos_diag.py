#!/usr/bin/env python
"""Diagnose the capstone R-VOS outlier (VERDICT r3 #7).

JOINTRESULT.json: one jointly-trained checkpoint scores VOS J&F 0.954 but
R-VOS J&F 0.309. Competing hypotheses:

  H1 exposure   the capstone mixture gave grounding only ~475 of 2500
                steps (same shape as the diagnosed VIS regression)
  H2 selection  the referring pathway picks the WRONG object (language
                discrimination fails among the fixture's distractors)
  H3 mask       the right object is selected but its mask is poor
  H4 driver     the offline/online R-VOS driver mangles the output

Protocol: train grounding-ONLY on the capstone's EXACT R-VOS fixture
(make_mini_ytvis seed=37, max_objects=3, referring=True) at two exposures
(one matching the capstone's ~475 grounding steps, one 3x), then decompose
every video into per-frame (selection IoU, mask J | selected) so H2/H3/H4
separate. Writes RVOS_DIAG.json (bench.py aggregate).

Usage: python tools/rvos_diag.py [--device tpu] [--steps 500 1500]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def iou_xyxy(a, b):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    ar_a = (a[2] - a[0]) * (a[3] - a[1])
    ar_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(ar_a + ar_b - inter, 1e-9)


def decompose(model, params, cfg, val_recs, H, W):
    """Per-frame selection + mask quality decomposition.

    Round 5: uses the production make_rvos_frame_step (chained prev-embed
    state), so the decomposition measures exactly the selection the driver
    ships — including the temporal-consistency blend when
    cfg.rvos_temporal_weight > 0."""
    import jax
    import jax.numpy as jnp

    from _evidence_common import frames_of, scaled_track_gt
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.mot_inference import RVOSDriver
    from uninext_tpu.engine.sot_inference import make_rvos_frame_step
    from uninext_tpu.evaluation.davis_eval import evaluate_davis
    from uninext_tpu.models.detr import UninextDETR

    tok = BertTokenizer()
    encode = jax.jit(lambda p, a, b: model.apply(
        {"params": p}, a, b, method=UninextDETR.encode_text))
    step = make_rvos_frame_step(model, cfg, H, W)
    drv = RVOSDriver(model, params, cfg, H, W)
    img_masks = jnp.zeros((1, H, W), bool)
    sizes = jnp.asarray([[H, W]], jnp.int32)

    sel_iou, j_sel, j_all, jf_all = [], [], [], []
    for rec in val_recs:
        expr = rec["expressions"][0]
        t = tok(expr, max_length=cfg.data.max_text_len)
        lang = encode(params, jnp.asarray(t["input_ids"][None]),
                      jnp.asarray(t["attention_mask"][None]))
        gt_xywh, _, gt_masks = scaled_track_gt(rec, H, W)
        frames = frames_of(rec)
        # per-frame selection + network-scale mask quality
        prev_embed = jnp.zeros((1, cfg.transformer.d_model))
        has_prev = jnp.zeros((), bool)
        for fi, fr in enumerate(frames):
            r = step(params, fr, img_masks, sizes, lang["hidden"],
                     lang["masks"], prev_embed, has_prev)
            prev_embed = r["embed"]
            has_prev = jnp.ones((), bool)
            cx, cy, bw, bh = np.asarray(r["box_cxcywh"][0], np.float32)
            pred = np.array([(cx - bw / 2) * W, (cy - bh / 2) * H,
                             (cx + bw / 2) * W, (cy + bh / 2) * H])
            g = gt_xywh[fi]
            gt = np.array([g[0], g[1], g[0] + g[2], g[1] + g[3]])
            iou = iou_xyxy(pred, gt)
            sel_iou.append(iou)
            logit = np.asarray(r["mask_logits"][0], np.float32)
            from PIL import Image
            m = np.asarray(Image.fromarray(logit).resize(
                (W, H), Image.BILINEAR)) > 0
            inter = (m & gt_masks[fi]).sum()
            union = (m | gt_masks[fi]).sum()
            j = inter / max(union, 1)
            j_all.append(j)
            if iou >= 0.5:
                j_sel.append(j)
        # the production driver end-to-end (H4 check): original-resolution
        pred_masks = drv.run_video(frames, img_masks, sizes, lang["hidden"],
                                   lang["masks"],
                                   ori_size=(rec["height"], rec["width"]))
        _, _, gt_ori = scaled_track_gt(rec, rec["height"], rec["width"])
        jf = evaluate_davis({1: [m.astype(bool) for m in pred_masks]},
                            {1: gt_ori})["J&F"]
        jf_all.append(jf)
    n = len(sel_iou)
    return {
        "selection_acc_iou50": round(float(np.mean(
            [i >= 0.5 for i in sel_iou])), 4),
        "mean_selection_iou": round(float(np.mean(sel_iou)), 4),
        "mask_j_all_frames": round(float(np.mean(j_all)), 4),
        "mask_j_when_selected": (round(float(np.mean(j_sel)), 4)
                                 if j_sel else None),
        "driver_jf": round(float(np.mean(jf_all)), 4),
        "n_frames": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--steps", nargs="+", type=int, default=[500, 1500])
    ap.add_argument("--train-videos", type=int, default=8,
                    help="round 5: RVOS_DIAG pinned weak selection on "
                         "8-video supervision; 32 tests whether selection "
                         "acc scales with (category, distractor) pairs")
    ap.add_argument("--temporal-weights", nargs="+", type=float,
                    default=[0.0],
                    help="rvos_temporal_weight sweep on the SAME trained "
                         "checkpoint (paired; VERDICT r4 #3 temporal "
                         "selection consistency)")
    ap.add_argument("--out", default=os.path.join(REPO, "RVOS_DIAG.json"))
    ap.add_argument("--merge", action="store_true",
                    help="keep arms already recorded in --out")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".xla_cache"
                                   if args.device == "tpu"
                                   else ".xla_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from _evidence_common import build_tiny_cfg, eval_rvos
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.trainer import Trainer

    # the capstone's EXACT R-VOS fixture (real_joint_check.py:72);
    # --train-videos > 8 grows only the train split (val protocol fixed)
    rvos_root = tempfile.mkdtemp(prefix="rvosdiag_")
    paths = make_mini_ytvis(rvos_root, n_train=args.train_videos, length=6,
                            max_objects=3, seed=37, referring=True)
    train, cats = load_ytvis_json(paths["train_json"], paths["train_root"],
                                  has_expression=True)
    val, _ = load_ytvis_json(paths["val_json"], paths["val_root"],
                             has_expression=True)
    tok = BertTokenizer()

    payload = {"capstone_anchor": {"joint_rvos_jf": 0.3087,
                                   "joint_vos_jf": 0.9543,
                                   "grounding_steps_in_capstone": 475},
               "arms": []}
    import dataclasses
    for steps in args.steps:
        cfg = build_tiny_cfg(steps, frame_range=7, use_reid=True)
        mapper = VideoPairMapper(cfg.data, cats, tok,
                                 sampling_frame_range=5)
        loader = MultiDatasetLoader([(train, mapper, 2, "grounding")],
                                    [1.0], seed=0, num_workers=2)
        t0 = time.time()
        tr = Trainer(cfg, iter(loader),
                     output_dir=tempfile.mkdtemp(prefix="rvosdiag_out_"),
                     task="grounding", has_masks=True, use_mesh=False,
                     video=True, log_period=100)
        tr.train()
        secs = time.time() - t0
        # paired temporal-weight sweep: SAME checkpoint, selection rule
        # varies only through cfg.rvos_temporal_weight
        for w in args.temporal_weights:
            cfg_w = dataclasses.replace(cfg, rvos_temporal_weight=w)
            jf = eval_rvos(tr.model, tr.state.params, cfg_w, val, 192, 256)
            dec = decompose(tr.model, tr.state.params, cfg_w, val, 192, 256)
            arm = {"spec": f"grounding_single@{steps}"
                   + (f"_tv{args.train_videos}"
                      if args.train_videos != 8 else "")
                   + (f"_tw{w}" if w else ""),
                   "train_videos": len(train),
                   "temporal_weight": w,
                   "train_seconds": round(secs, 1),
                   "rvos_jf_network_scale": round(jf, 4), **dec}
            print(f"[arm] {arm}", flush=True)
            payload["arms"].append(arm)
        del tr
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        done = {a["spec"] for a in payload["arms"]}
        payload["arms"] = [a for a in prev.get("arms", [])
                           if a["spec"] not in done] + payload["arms"]
        if "conclusion" in prev:
            payload["r4_conclusion"] = prev["conclusion"]
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
