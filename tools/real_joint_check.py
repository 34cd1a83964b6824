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
        cfg, use_reid=True,
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
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO, "JOINTRESULT.json"))
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
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.sot_inference import SOTDriver, VOSDriver
    from uninext_tpu.engine.trainer import Trainer
    from uninext_tpu.engine.video_inference import VISDriver
    from uninext_tpu.evaluation.davis_eval import evaluate_davis
    from uninext_tpu.evaluation.sot_eval import (evaluate_sot_dataset)
    from uninext_tpu.evaluation.ytvis_eval import (evaluate_ytvis,
                                                   video_output_to_ytvis)

    vis_root = tempfile.mkdtemp(prefix="joint_vis_")
    sot_root = tempfile.mkdtemp(prefix="joint_sot_")
    vis_paths = make_mini_ytvis(vis_root, length=6, max_objects=2)
    sot_paths = make_mini_ytvis(sot_root, length=8, max_objects=1, seed=11)
    print(f"[data] vis at {vis_root}, sot at {sot_root}")

    cfg = build_cfg(args.steps)
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

    out_dir = tempfile.mkdtemp(prefix="joint_out_")
    t0 = time.time()
    trainer = Trainer(cfg, iter(loader), output_dir=out_dir,
                      task="detection", has_masks=True, use_mesh=False,
                      video=True, log_period=50)
    trainer.train()
    train_s = time.time() - t0
    assert set(trainer._steps) == {"detection", "sot"}, trainer._steps
    print(f"[train] {args.steps} routed joint steps in {train_s:.0f}s "
          f"(steps compiled: {sorted(trainer._steps)})")

    H, W = 192, 256
    p = trainer.state.params
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    img_masks = jnp.zeros((1, H, W), bool)
    sizes = jnp.asarray([[H, W]], jnp.int32)

    def frames_of(rec):
        out = []
        for fp in rec["file_names"]:
            img = (np.asarray(Image.open(fp).convert("RGB"), np.float32)
                   - mean) / std
            out.append(jnp.asarray(img[None]))
        return out

    # ---- VIS on the same checkpoint ----
    tids, tmask, cmap = create_label_token_map(cats, tok,
                                               cfg.data.max_text_len)
    vis_drv = VISDriver(trainer.model, p, cfg, jnp.asarray(cmap), H, W)
    results = []
    for rec in vis_val:
        out = vis_drv.run_video(frames_of(rec), img_masks, sizes,
                                jnp.asarray(tids[None]),
                                jnp.asarray(tmask[None]),
                                ori_size=(rec["height"], rec["width"]))
        results.extend(video_output_to_ytvis(rec["video_id"], out))
    with open(vis_paths["val_json"]) as f:
        gt = json.load(f)
    id_map = {i + 1: c["id"] for i, c in enumerate(
        sorted(gt["categories"], key=lambda c: c["id"]))}
    for r in results:
        r["category_id"] = id_map.get(r["category_id"], r["category_id"])
    vis_res = evaluate_ytvis(results, gt)
    print(f"[vis] {vis_res}")

    # ---- SOT + VOS on the same checkpoint ----
    sot_drv = SOTDriver(trainer.model, p, cfg, H, W)
    vos_drv = VOSDriver(trainer.model, p, cfg, H, W)
    per_seq, jf_all = {}, []
    for rec in sot_val:
        frames = frames_of(rec)
        track = rec["tracks"][0]
        sx, sy = W / rec["width"], H / rec["height"]
        gt_xywh = np.array([[b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy]
                            for b in track["bboxes"]], np.float32)
        init_xyxy = np.array([gt_xywh[0, 0], gt_xywh[0, 1],
                              gt_xywh[0, 0] + gt_xywh[0, 2],
                              gt_xywh[0, 1] + gt_xywh[0, 3]], np.float32)
        boxes, _ = sot_drv.run_video(frames, img_masks, sizes, init_xyxy)
        per_seq[f"vid{rec['video_id']}"] = {
            "pred": np.stack([boxes[:, 0], boxes[:, 1],
                              boxes[:, 2] - boxes[:, 0],
                              boxes[:, 3] - boxes[:, 1]], 1),
            "gt": gt_xywh}
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
        jf_all.append(evaluate_davis({1: [l == 1 for l in labels]},
                                     {1: gt_masks})["J&F"])
    sot_agg = evaluate_sot_dataset(per_seq)
    print(f"[sot] {sot_agg}  [vos] J&F={float(np.mean(jf_all)):.3f}")

    payload = {
        "joint_vis_map": round(float(vis_res["AP"]), 4),
        "joint_vis_ap50": round(float(vis_res["AP50"]), 4),
        "joint_sot_auc": round(float(sot_agg["AUC"]), 4),
        "joint_vos_jf": round(float(np.mean(jf_all)), 4),
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
