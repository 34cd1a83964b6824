#!/usr/bin/env python
"""End-to-end VIS mAP on a real-format YTVIS dataset: files -> video train
-> streaming VISDriver -> track mAP.

Companion of tools/real_ap_check.py for the VIDEO family (BASELINE config 4
terminates in a YT-VIS mAP): generates a mini YTVIS dataset (moving colored
shapes, real JPEG frame dirs + ytvis-schema json), overfits the two-frame
(key, ref) video train step (reid contrastive loss included), then streams
every val video through the IDOL tracker driver and scores the ytvis result
json with the offline track-mAP evaluator
(evaluation/ytvis_eval.evaluate_ytvis; the reference can only submit to the
codalab server). Writes VISRESULT.json at the repo root, picked up by
bench.py's aggregate.

Usage: python tools/real_vis_check.py [--steps 300] [--device cpu|tpu]
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


def flagship_cfg(steps: int):
    """The REAL video_joint_r50 stage-3 preset (R50 + 12-layer frozen BERT
    + deformable reid head + 4-channel template backbone + SOT fusion, 900
    queries) with only data resolution and schedule shrunk to sandbox scale
    — the video counterpart of real_ap_check.py --flagship (VERDICT r2 #4)."""
    import dataclasses

    from uninext_tpu.config import video_joint_r50
    cfg = video_joint_r50()
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, max_insts=8,
            min_size_train=(192,), max_size_train=256,
            min_size_test=192, max_size_test=256),
        solver=dataclasses.replace(
            cfg.solver, base_lr=1e-4, vl_lr=1e-4,
            warmup_iters=50, max_iter=steps,
            checkpoint_period=10 ** 9, steps=(int(steps * 0.8),)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO, "VISRESULT.json"))
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--n-train", type=int, default=32,
                    help="mini-YTVIS train size (round 5, VERDICT r4 #6: "
                         "8 videos left seed bands too wide — 0.25-0.40 "
                         "single-task mAP across 3 seeds — to resolve 20% "
                         "effects; the generator makes 32 cheap)")
    ap.add_argument("--n-val", type=int, default=24,
                    help="mini-YTVIS val size (round 5 re-power; round 4 "
                         "used 16, earlier rounds 4)")
    ap.add_argument("--seeds", type=int, default=1,
                    help=">1: train/eval at seeds 0..n-1 and record the "
                         "seed band under VISRESULT.json['seed_band'] "
                         "(fixture stays seed 0 — the band isolates "
                         "training stochasticity at fixed data)")
    ap.add_argument("--flagship", action="store_true",
                    help="train the real video_joint_r50 stage-3 preset; "
                         "result recorded under VISRESULT.json['flagship']")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from _evidence_common import build_tiny_cfg, eval_vis
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.trainer import Trainer

    root = args.data_root or tempfile.mkdtemp(prefix="mini_ytvis_")
    paths = make_mini_ytvis(root, n_train=args.n_train, n_val=args.n_val)
    print(f"[data] mini-ytvis at {root}")

    cfg = (flagship_cfg(args.steps) if args.flagship else
           build_tiny_cfg(args.steps, frame_range=5, use_reid=True))
    train_recs, cats = load_ytvis_json(paths["train_json"],
                                       paths["train_root"])
    val_recs, _ = load_ytvis_json(paths["val_json"], paths["val_root"])
    mapper = VideoPairMapper(cfg.data, cats, is_train=True, with_masks=True,
                             sampling_frame_range=5)

    per_seed = []
    for seed in range(args.seeds):
        loader = MultiDatasetLoader([(train_recs, mapper, 2)], [1.0],
                                    seed=seed, num_workers=2)
        t0 = time.time()
        trainer = Trainer(cfg, iter(loader),
                          output_dir=tempfile.mkdtemp(
                              prefix="vis_check_out_"),
                          task="detection", has_masks=True, use_mesh=False,
                          video=True, log_period=50)
        trainer.train()
        train_s = time.time() - t0
        print(f"[train] seed {seed}: {args.steps} video-pair steps in "
              f"{train_s:.0f}s", flush=True)

        res = eval_vis(trainer.model, trainer.state.params, cfg, val_recs,
                       paths["val_json"], cats, 192, 256)
        res = {k: (None if not np.isfinite(v) else round(float(v), 4))
               for k, v in res.items()}
        print(f"[eval] seed {seed} track mAP: {res}", flush=True)
        per_seed.append({"seed": seed, "vis_map": res["AP"],
                         "vis_ap50": res["AP50"],
                         "train_seconds": round(train_s, 1)})
        del trainer

    res0 = per_seed[0]
    payload = {
        "vis_map": res0["vis_map"], "vis_ap50": res0["vis_ap50"],
        "dataset": "mini-ytvis (real-format generated; no real YT-VIS in "
                   "sandbox)",
        "n_train_videos": len(train_recs), "n_val_videos": len(val_recs),
        "steps": args.steps, "train_seconds": res0["train_seconds"],
        "pipeline": "jpeg frames->VideoPairMapper->Trainer(video)->"
                    "VISDriver(IDOL)->ytvis json->track mAP",
    }
    if args.seeds > 1:
        maps = [r["vis_map"] for r in per_seed]
        payload["seed_band"] = {
            "per_seed": per_seed,
            "min": min(maps), "max": max(maps),
            "spread": round(max(maps) - min(maps), 4),
            "protocol": f"{len(train_recs)} train / {len(val_recs)} val "
                        f"videos, data-order seeds 0..{args.seeds - 1}",
        }
    if args.flagship:
        payload["config"] = "video_joint_r50 (real stage-3 flagship preset)"
        existing = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                existing = json.load(f)
        existing["flagship"] = payload
        payload = existing
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
