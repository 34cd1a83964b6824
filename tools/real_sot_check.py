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
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_cfg(steps: int):
    from uninext_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, max_insts=8, max_text_len=32,
            min_size_train=(192,), max_size_train=256,
            min_size_test=192, max_size_test=256,
            sampling_frame_range=7),
        solver=dataclasses.replace(
            cfg.solver, base_lr=3e-4, lang_lr=3e-4, vl_lr=3e-4,
            backbone_multiplier=1.0, warmup_iters=40, grad_clip=1.0,
            max_iter=steps, checkpoint_period=10 ** 9,
            steps=(int(steps * 0.8),)),
    )
    return cfg


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
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.masks import polygons_to_mask
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.sot_inference import SOTDriver, VOSDriver
    from uninext_tpu.engine.trainer import Trainer
    from uninext_tpu.evaluation.davis_eval import evaluate_davis
    from uninext_tpu.evaluation.sot_eval import (evaluate_sot,
                                                 evaluate_sot_dataset)

    root = args.data_root or tempfile.mkdtemp(prefix="mini_sot_")
    paths = make_mini_ytvis(root, length=8, max_objects=1)
    print(f"[data] mini single-object videos at {root}")

    cfg = build_cfg(args.steps)
    train_recs, cats = load_ytvis_json(paths["train_json"],
                                       paths["train_root"])
    val_recs, _ = load_ytvis_json(paths["val_json"], paths["val_root"])
    mapper = VideoPairMapper(cfg.data, cats, is_train=True, with_masks=True,
                             sampling_frame_range=cfg.data.
                             sampling_frame_range)
    loader = MultiDatasetLoader([(train_recs, mapper, 2, "sot")], [1.0],
                                seed=0, num_workers=2)

    out_dir = tempfile.mkdtemp(prefix="sot_check_out_")
    t0 = time.time()
    trainer = Trainer(cfg, iter(loader), output_dir=out_dir,
                      task="sot", has_masks=True, use_mesh=False,
                      video=True, log_period=50)
    trainer.train()
    train_s = time.time() - t0
    print(f"[train] {args.steps} sot template steps in {train_s:.0f}s")

    H, W = 192, 256
    p = trainer.state.params
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    img_masks = jnp.zeros((1, H, W), bool)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    sot_drv = SOTDriver(trainer.model, p, cfg, H, W)
    vos_drv = VOSDriver(trainer.model, p, cfg, H, W)

    per_seq = {}
    jf_all = []
    for rec in val_recs:
        frames = []
        for fp in rec["file_names"]:
            img = (np.asarray(Image.open(fp).convert("RGB"), np.float32)
                   - mean) / std
            frames.append(jnp.asarray(img[None]))
        track = rec["tracks"][0]
        sx, sy = W / rec["width"], H / rec["height"]
        gt_xywh = np.array([[b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy]
                            for b in track["bboxes"]], np.float32)
        init_xyxy = np.array([gt_xywh[0, 0], gt_xywh[0, 1],
                              gt_xywh[0, 0] + gt_xywh[0, 2],
                              gt_xywh[0, 1] + gt_xywh[0, 3]], np.float32)
        boxes, _times = sot_drv.run_video(frames, img_masks, sizes,
                                          init_xyxy)
        pred_xywh = np.stack([boxes[:, 0], boxes[:, 1],
                              boxes[:, 2] - boxes[:, 0],
                              boxes[:, 3] - boxes[:, 1]], 1)
        name = f"vid{rec['video_id']}"
        per_seq[name] = {"pred": pred_xywh, "gt": gt_xywh}
        seq_m = evaluate_sot(pred_xywh, gt_xywh)
        print(f"[sot] {name} AUC={seq_m['AUC']:.3f} P={seq_m['P']:.3f}")

        # VOS: init from the first-frame gt mask, score J&F per frame
        gt_masks = []
        for fi in range(rec["length"]):
            segs = track["segmentations"][fi]
            m = polygons_to_mask(
                [np.array(s) * np.array([sx, sy] * (len(s) // 2))
                 for s in segs], H, W) if segs else np.zeros((H, W), np.uint8)
            gt_masks.append(m.astype(bool))
        init = {1: {"frame": 0, "mask": gt_masks[0].astype(np.float32),
                    "box_xyxy": init_xyxy}}
        labels = vos_drv.run_video(frames, img_masks, sizes, init)
        res = evaluate_davis({1: [l == 1 for l in labels]}, {1: gt_masks})
        jf_all.append(res["J&F"])
        print(f"[vos] vid{rec['video_id']} J&F={res['J&F']:.3f}")

    agg = evaluate_sot_dataset(per_seq)
    payload = {
        "sot_auc": round(float(agg["AUC"]), 4),
        "sot_precision": round(float(agg["P"]), 4),
        "vos_jf": round(float(np.mean(jf_all)), 4),
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
