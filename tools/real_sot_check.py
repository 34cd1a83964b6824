#!/usr/bin/env python
"""End-to-end SOT AUC + VOS J&F on real-format video data: files ->
template-prompt training -> streaming SOT/VOS drivers -> metrics.

Completes the per-task-family evidence matrix (det/segm: real_ap_check,
VIS: real_vis_check): generates single-object mini videos, trains the
stage-3 SOT path (`forward_sot_train` — template crop from the ref frame as
the prompt), then tracks every held-out video from its first-frame box
(SOTDriver -> AUC/precision) and from its first-frame mask (VOSDriver ->
DAVIS J&F soft-aggregation path). Writes SOTRESULT.json at the repo root,
picked up by bench.py's aggregate.

Usage: python tools/real_sot_check.py [--steps 300] [--device cpu|tpu]
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO, "SOTRESULT.json"))
    ap.add_argument("--data-root", default=None)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from _evidence_common import build_tiny_cfg, eval_sot_vos
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.trainer import Trainer

    root = args.data_root or tempfile.mkdtemp(prefix="mini_sot_")
    paths = make_mini_ytvis(root, length=8, max_objects=1)
    print(f"[data] mini single-object videos at {root}")

    cfg = build_tiny_cfg(args.steps, frame_range=7)
    train_recs, cats = load_ytvis_json(paths["train_json"],
                                       paths["train_root"])
    val_recs, _ = load_ytvis_json(paths["val_json"], paths["val_root"])
    mapper = VideoPairMapper(cfg.data, cats, is_train=True, with_masks=True,
                             sampling_frame_range=7)
    loader = MultiDatasetLoader([(train_recs, mapper, 2, "sot")], [1.0],
                                seed=0, num_workers=2)

    t0 = time.time()
    trainer = Trainer(cfg, iter(loader),
                      output_dir=tempfile.mkdtemp(prefix="sot_check_out_"),
                      task="sot", has_masks=True, use_mesh=False,
                      video=True, log_period=50)
    trainer.train()
    train_s = time.time() - t0
    print(f"[train] {args.steps} sot template steps in {train_s:.0f}s")

    agg, jf = eval_sot_vos(trainer.model, trainer.state.params, cfg,
                           val_recs, 192, 256)
    payload = {
        "sot_auc": round(float(agg["AUC"]), 4),
        "sot_precision": round(float(agg["P"]), 4),
        "vos_jf": round(jf, 4),
        "dataset": "mini single-object videos (real-format generated)",
        "n_train_videos": len(train_recs), "n_val_videos": len(val_recs),
        "steps": args.steps, "train_seconds": round(train_s, 1),
        "pipeline": "jpeg frames->forward_sot_train(template prompt)->"
                    "SOTDriver AUC + VOSDriver J&F",
    }
    print(json.dumps(payload, indent=1))
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
