#!/usr/bin/env python
"""ONE jointly-trained model across prompt types — the UNINEXT premise —
scored end-to-end on every video metric.

Mixes two datasets through the multi-task loader (category-prompt VIS pairs
with the reid contrastive step, template-prompt SOT pairs with
forward_sot_train) exactly like the stage-3 video_joint recipe routes its
14 datasets, trains a single state, then evaluates that one checkpoint on:
  * VIS:  streaming IDOL driver -> offline track mAP
  * SOT:  first-frame box tracking -> AUC / precision
  * VOS:  first-frame mask -> soft-aggregation J&F
Writes JOINTRESULT.json at the repo root (bench.py aggregate).

Usage: python tools/real_joint_check.py [--steps 600] [--device cpu|tpu]
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
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO, "JOINTRESULT.json"))
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from _evidence_common import build_tiny_cfg, eval_sot_vos, eval_vis
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.trainer import Trainer

    vis_root = tempfile.mkdtemp(prefix="joint_vis_")
    sot_root = tempfile.mkdtemp(prefix="joint_sot_")
    vis_paths = make_mini_ytvis(vis_root, length=6, max_objects=2)
    sot_paths = make_mini_ytvis(sot_root, length=8, max_objects=1, seed=11)
    print(f"[data] vis at {vis_root}, sot at {sot_root}")

    cfg = build_tiny_cfg(args.steps, frame_range=7, use_reid=True)
    tok = BertTokenizer()
    vis_train, cats = load_ytvis_json(vis_paths["train_json"],
                                      vis_paths["train_root"])
    vis_val, _ = load_ytvis_json(vis_paths["val_json"], vis_paths["val_root"])
    sot_train, _ = load_ytvis_json(sot_paths["train_json"],
                                   sot_paths["train_root"])
    sot_val, _ = load_ytvis_json(sot_paths["val_json"], sot_paths["val_root"])
    m_vis = VideoPairMapper(cfg.data, cats, tok, sampling_frame_range=5)
    m_sot = VideoPairMapper(cfg.data, cats, tok, sampling_frame_range=7)
    loader = MultiDatasetLoader(
        [(vis_train, m_vis, 2, "detection"), (sot_train, m_sot, 2, "sot")],
        [0.5, 0.5], seed=0, num_workers=2)

    t0 = time.time()
    trainer = Trainer(cfg, iter(loader),
                      output_dir=tempfile.mkdtemp(prefix="joint_out_"),
                      task="detection", has_masks=True, use_mesh=False,
                      video=True, log_period=50)
    trainer.train()
    train_s = time.time() - t0
    assert set(trainer._steps) == {"detection", "sot"}, trainer._steps
    print(f"[train] {args.steps} routed joint steps in {train_s:.0f}s "
          f"(steps compiled: {sorted(trainer._steps)})")

    p = trainer.state.params
    vis_res = eval_vis(trainer.model, p, cfg, vis_val,
                       vis_paths["val_json"], cats, 192, 256)
    print(f"[vis] {vis_res}")
    sot_agg, jf = eval_sot_vos(trainer.model, p, cfg, sot_val, 192, 256)
    print(f"[sot] {sot_agg}  [vos] J&F={jf:.3f}")

    payload = {
        "joint_vis_map": round(float(vis_res["AP"]), 4),
        "joint_vis_ap50": round(float(vis_res["AP50"]), 4),
        "joint_sot_auc": round(float(sot_agg["AUC"]), 4),
        "joint_vos_jf": round(jf, 4),
        "dataset": "mini VIS + single-object videos, ONE jointly trained "
                   "model (multi-task routed stage-3)",
        "steps": args.steps, "train_seconds": round(train_s, 1),
        "pipeline": "mixed loader (detection pairs + sot template pairs) ->"
                    " routed Trainer -> one checkpoint -> VIS mAP + SOT AUC"
                    " + VOS J&F",
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}: {payload}")


if __name__ == "__main__":
    main()
