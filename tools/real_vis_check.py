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
            sampling_frame_range=5),
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
    ap.add_argument("--out", default=os.path.join(REPO, "VISRESULT.json"))
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
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.trainer import Trainer
    from uninext_tpu.engine.video_inference import VISDriver
    from uninext_tpu.evaluation.ytvis_eval import (evaluate_ytvis,
                                                   video_output_to_ytvis)

    root = args.data_root or tempfile.mkdtemp(prefix="mini_ytvis_")
    paths = make_mini_ytvis(root)
    print(f"[data] mini-ytvis at {root}")

    cfg = build_cfg(args.steps)
    train_recs, cats = load_ytvis_json(paths["train_json"],
                                       paths["train_root"])
    val_recs, _ = load_ytvis_json(paths["val_json"], paths["val_root"])
    tok = BertTokenizer()
    mapper = VideoPairMapper(cfg.data, cats, tok, is_train=True,
                             with_masks=True,
                             sampling_frame_range=cfg.data.
                             sampling_frame_range)
    loader = MultiDatasetLoader([(train_recs, mapper, 2)], [1.0],
                                seed=0, num_workers=2)

    out_dir = tempfile.mkdtemp(prefix="vis_check_out_")
    t0 = time.time()
    trainer = Trainer(cfg, iter(loader), output_dir=out_dir,
                      task="detection", has_masks=True, use_mesh=False,
                      video=True, log_period=50)
    trainer.train()
    train_s = time.time() - t0
    print(f"[train] {args.steps} video-pair steps in {train_s:.0f}s")

    # ---- streaming eval over the val videos ----
    H, W = 192, 256
    tids, tmask, cmap = create_label_token_map(cats, tok,
                                               cfg.data.max_text_len)
    drv = VISDriver(trainer.model, trainer.state.params, cfg,
                    jnp.asarray(cmap), H, W)
    mean = np.array([123.675, 116.28, 103.53], np.float32)
    std = np.array([58.395, 57.12, 57.375], np.float32)
    results = []
    for rec in val_recs:
        frames = []
        for p in rec["file_names"]:
            img = (np.asarray(Image.open(p).convert("RGB"), np.float32)
                   - mean) / std
            frames.append(jnp.asarray(img[None]))
        img_masks = jnp.zeros((1, H, W), bool)
        sizes = jnp.asarray([[H, W]], jnp.int32)
        out = drv.run_video(frames, img_masks, sizes,
                            jnp.asarray(tids[None]), jnp.asarray(tmask[None]),
                            ori_size=(rec["height"], rec["width"]))
        results.extend(video_output_to_ytvis(rec["video_id"], out))
    with open(paths["val_json"]) as f:
        gt = json.load(f)
    # result category ids are contiguous-index+offset; map back to the
    # dataset's non-contiguous ids the same way eval_video.py does
    id_map = {i + 1: c["id"] for i, c in enumerate(
        sorted(gt["categories"], key=lambda c: c["id"]))}
    for r in results:
        r["category_id"] = id_map.get(r["category_id"], r["category_id"])
    res = evaluate_ytvis(results, gt)
    res = {k: (None if not np.isfinite(v) else round(float(v), 4))
           for k, v in res.items()}
    print(f"[eval] track mAP: {res}")

    payload = {
        "vis_map": res["AP"], "vis_ap50": res["AP50"],
        "dataset": "mini-ytvis (real-format generated; no real YT-VIS in "
                   "sandbox)",
        "n_train_videos": len(train_recs), "n_val_videos": len(val_recs),
        "steps": args.steps, "train_seconds": round(train_s, 1),
        "pipeline": "jpeg frames->VideoPairMapper->Trainer(video)->"
                    "VISDriver(IDOL)->ytvis json->track mAP",
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
