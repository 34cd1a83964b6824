#!/usr/bin/env python
"""ONE jointly-trained model across prompt types — the UNINEXT premise —
scored end-to-end on every video task family.

Mirrors the reference's 13-dataset stage-3 video_joint mixture
(configs/video_joint_r50.yaml:38-75; dispatch uninext_vid.py:256-300) at
sandbox scale: FOUR datasets routed through the multi-task loader —

  * VIS pairs        (category prompt, reid contrastive)   task=detection
  * BDD-track pairs  (category prompt, 3-object crowds)    task=detection
  * R-VOS pairs      (referring expression prompt)         task=grounding
  * SOT pairs        (first-frame template prompt)         task=sot

— trains a single state, then scores that ONE checkpoint on FIVE families:

  VIS    streaming IDOL driver -> offline track mAP
  MOT    QDTrack association   -> pooled CLEAR-MOT MOTA / IDF1
  SOT    first-frame box       -> AUC / precision
  VOS    first-frame mask      -> soft-aggregation J&F
  R-VOS  expression prompt     -> per-frame top-1 mask J&F

The VIS-heavy mixture ratio follows the exposure diagnosis in
tools/joint_vis_ab.py / JOINTABRESULT.json (VERDICT r2 #5): joint VIS mAP
tracks the routed VIS step count, so the stage-3 recipe weights detection
pairs high exactly as the reference's DATASET_RATIO does.
Writes JOINTRESULT.json at the repo root (bench.py aggregate).

Usage: python tools/real_joint_check.py [--steps 2000] [--device cpu|tpu]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO, "JOINTRESULT.json"))
    ap.add_argument("--weights", type=float, nargs=4,
                    default=[0.45, 0.15, 0.2, 0.2],
                    metavar=("VIS", "BDD", "RVOS", "SOT"),
                    help="mixture ratios (the DATASET_RATIO lever)")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from _evidence_common import (build_tiny_cfg, eval_mot, eval_rvos,
                                  eval_sot_vos, eval_vis)
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.trainer import Trainer

    vis_root = tempfile.mkdtemp(prefix="joint_vis_")
    bdd_root = tempfile.mkdtemp(prefix="joint_bdd_")
    rvos_root = tempfile.mkdtemp(prefix="joint_rvos_")
    sot_root = tempfile.mkdtemp(prefix="joint_sot_")
    vis_paths = make_mini_ytvis(vis_root, length=6, max_objects=2)
    bdd_paths = make_mini_ytvis(bdd_root, length=8, max_objects=3, seed=23)
    rvos_paths = make_mini_ytvis(rvos_root, length=6, max_objects=3,
                                 seed=37, referring=True)
    sot_paths = make_mini_ytvis(sot_root, length=8, max_objects=1, seed=11)
    print(f"[data] vis {vis_root} bdd {bdd_root} rvos {rvos_root} "
          f"sot {sot_root}")

    cfg = build_tiny_cfg(args.steps, frame_range=7, use_reid=True)
    tok = BertTokenizer()

    def load(paths, **kw):
        tr, cats = load_ytvis_json(paths["train_json"], paths["train_root"],
                                   **kw)
        va, _ = load_ytvis_json(paths["val_json"], paths["val_root"], **kw)
        return tr, va, cats

    vis_train, vis_val, cats = load(vis_paths)
    bdd_train, bdd_val, _ = load(bdd_paths)
    rvos_train, rvos_val, _ = load(rvos_paths, has_expression=True)
    sot_train, sot_val, _ = load(sot_paths)

    m_vis = VideoPairMapper(cfg.data, cats, tok, sampling_frame_range=5)
    m_bdd = VideoPairMapper(cfg.data, cats, tok, sampling_frame_range=3)
    m_rvos = VideoPairMapper(cfg.data, cats, tok, sampling_frame_range=5)
    m_sot = VideoPairMapper(cfg.data, cats, tok, sampling_frame_range=7)
    # VIS-heavy per the exposure diagnosis (JOINTABRESULT.json): detection
    # pairs carry the track-mAP metric, so they keep the lion's share —
    # the same shape as the reference's DATASET_RATIO for stage 3
    loader = MultiDatasetLoader(
        [(vis_train, m_vis, 2, "detection"),
         (bdd_train, m_bdd, 2, "detection"),
         (rvos_train, m_rvos, 2, "grounding"),
         (sot_train, m_sot, 2, "sot")],
        args.weights, seed=0, num_workers=2)

    counts = {}

    def counting(it):
        for b in it:
            counts[b.get("__task__", "?")] = \
                counts.get(b.get("__task__", "?"), 0) + 1
            yield b

    t0 = time.time()
    trainer = Trainer(cfg, counting(iter(loader)),
                      output_dir=tempfile.mkdtemp(prefix="joint_out_"),
                      task="detection", has_masks=True, use_mesh=False,
                      video=True, log_period=100)
    trainer.train()
    train_s = time.time() - t0
    assert set(trainer._steps) == {"detection", "grounding", "sot"}, \
        trainer._steps
    print(f"[train] {args.steps} routed joint steps in {train_s:.0f}s; "
          f"batches per task: {counts}", flush=True)

    p = trainer.state.params
    vis_res = eval_vis(trainer.model, p, cfg, vis_val,
                       vis_paths["val_json"], cats, 192, 256)
    print(f"[vis] {vis_res}", flush=True)
    mot_res = eval_mot(trainer.model, p, cfg, bdd_val, cats, 192, 256)
    print(f"[mot] {mot_res}", flush=True)
    sot_agg, jf = eval_sot_vos(trainer.model, p, cfg, sot_val, 192, 256)
    print(f"[sot] {sot_agg}  [vos] J&F={jf:.3f}", flush=True)
    rvos_jf = eval_rvos(trainer.model, p, cfg, rvos_val, 192, 256)
    print(f"[rvos] J&F={rvos_jf:.3f}", flush=True)

    payload = {
        "joint_vis_map": round(float(vis_res["AP"]), 4),
        "joint_vis_ap50": round(float(vis_res["AP50"]), 4),
        "joint_mot_mota": round(float(mot_res["MOTA"]), 4),
        "joint_mot_idf1": round(float(mot_res["IDF1"]), 4),
        "joint_sot_auc": round(float(sot_agg["AUC"]), 4),
        "joint_vos_jf": round(jf, 4),
        "joint_rvos_jf": round(rvos_jf, 4),
        "task_families_from_one_checkpoint": ["vis", "mot", "sot", "vos",
                                              "rvos"],
        "dataset": "4 mini video datasets (VIS + BDD-track + R-VOS "
                   "referring + SOT), ONE jointly trained model "
                   "(multi-task routed stage-3)",
        "steps": args.steps,
        "mixture_weights": args.weights,
        "steps_per_task": counts,
        "train_seconds": round(train_s, 1),
        "pipeline": "mixed loader (detection/grounding/sot pairs) -> routed "
                    "Trainer -> one checkpoint -> VIS mAP + CLEAR-MOT + SOT "
                    "AUC + VOS J&F + R-VOS J&F",
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}: {payload}")


if __name__ == "__main__":
    main()
