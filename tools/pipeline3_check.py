#!/usr/bin/env python
"""The COMPLETE 3-stage production pipeline, chained end-to-end:

  stage 1  object-detection pretrain        (obj365 surrogate, category
           prompts only)                     -> orbax checkpoint on disk
  stage 2  image joint (detection + REC/RES grounding, routed mixture)
           initialized from the stage-1 checkpoint
  stage 3  video joint (VIS pairs + SOT template pairs, routed mixture)
           initialized from stage-2 weights via load_stage_weights —
           the 4-channel template backbone INFLATED from the image
           backbone (conv1 3->4ch, zero-init mask channel)

mirroring the reference's weight hand-off chain (assets/TRAIN.md:
obj365 pretrain -> image_joint_r50 [WEIGHTS: obj365 model_final.pth,
configs/image_joint_r50.yaml:8] -> conversion/convert_3c_to_4c_pth.py ->
video_joint_r50 [configs/video_joint_r50.yaml:16]) at sandbox scale.
Because classification is query<->prompt alignment, the obj365->coco
category-set change needs no classifier surgery — the premise this
pipeline exists to exploit.

Each stage trains on its own generated real-format dataset and the final
checkpoint is scored on det AP + REC P@0.5 + VIS mAP + SOT AUC + VOS J&F.
Writes PIPELINE_RESULT.json at the repo root (bench.py aggregate).

Usage: python tools/pipeline3_check.py [--steps1 300 --steps2 400
       --steps3 600] [--device cpu|tpu]
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps1", type=int, default=300)
    ap.add_argument("--steps2", type=int, default=400)
    ap.add_argument("--steps3", type=int, default=600)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "PIPELINE_RESULT.json"))
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from _evidence_common import build_tiny_cfg, eval_sot_vos, eval_vis
    from uninext_tpu.data.coco import (UniDatasetMapper, load_coco_json,
                                       load_refcoco_json)
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import (make_mini_coco,
                                            make_mini_refcoco,
                                            make_mini_ytvis)
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json
    from uninext_tpu.engine.checkpoint import (CheckpointManager,
                                               load_stage_weights)
    from uninext_tpu.engine.evaluator import (DetectionEvaluator,
                                              evaluate_refcoco)
    from uninext_tpu.engine.trainer import Trainer

    tok = BertTokenizer()
    payload = {"stages": {}}

    # ---- stage 1: detection pretrain (obj365 surrogate) ------------------
    # Trains WITH BoxInst exactly like the reference stage 1
    # (obj365v2_32g_r50.yaml:3-4 MODEL.BOXINST.ENABLED True): the mapper
    # emits NO gt masks — only box bitmasks + LAB color similarity — and the
    # mask head learns from the projection + pairwise losses alone. Warmup
    # is scaled to the sandbox schedule so the pairwise term activates.
    s1_root = tempfile.mkdtemp(prefix="p3_obj365_")
    s1 = make_mini_coco(s1_root, seed=101)
    s1_train, s1_cats = load_coco_json(s1["train_json"], s1["train_root"])
    s1_val, _ = load_coco_json(s1["val_json"], s1["val_root"])
    cfg_img = build_tiny_cfg(args.steps1, min_size=224, max_size=352)
    cfg_img = dataclasses.replace(
        cfg_img, loss=dataclasses.replace(
            cfg_img.loss, boxinst=True,
            boxinst_warmup_iters=max(args.steps1 // 6, 20)))
    m1 = UniDatasetMapper(
        cfg_img.data, s1_cats, tok, is_train=True, with_masks=False,
        boxinst=True,
        boxinst_bottom_pixels=cfg_img.loss.boxinst_bottom_pixels_removed,
        lsj=True, lsj_size=224, lsj_min_scale=0.6, lsj_max_scale=1.4)
    loader1 = MultiDatasetLoader([(s1_train, m1, 2)], [1.0], seed=0,
                                 num_workers=2)
    s1_out = tempfile.mkdtemp(prefix="p3_s1_out_")
    t0 = time.time()
    tr1 = Trainer(cfg_img, iter(loader1), output_dir=s1_out,
                  task="detection", has_masks=True, use_mesh=False,
                  log_period=100)
    tr1.train()
    tr1.ckpt.save(int(tr1.state.step), tr1.state)   # hand-off artifact
    s1_s = time.time() - t0
    # box-supervised mask quality: segm AP against the fixture's REAL gt
    # masks, which the model never saw (it trained from boxes only)
    eval_m1 = UniDatasetMapper(cfg_img.data, s1_cats, tok, is_train=False,
                               with_masks=True)
    _, _, cmap1 = create_label_token_map(s1_cats, tok,
                                         cfg_img.data.max_text_len)
    seg1 = DetectionEvaluator(tr1.model, cfg_img, cmap1,
                              with_masks=True).evaluate(
        tr1.state.params, s1_val, eval_m1, score_thr=0.05)
    print(f"[stage1] {args.steps1} BoxInst pretrain steps in {s1_s:.0f}s -> "
          f"{tr1.ckpt.directory}; box-supervised mask AP "
          f"{seg1['AP']:.3f}", flush=True)
    boxinst_payload = {
        "enabled": True, "steps": args.steps1,
        "warmup_iters": cfg_img.loss.boxinst_warmup_iters,
        "supervision": "boxes only (box bitmasks + LAB pairwise); "
                       "no gt masks seen in training",
        "mask_ap_vs_real_gt_masks": round(float(seg1["AP"]), 4),
        "train_seconds": round(s1_s, 1)}
    payload["stages"]["1_pretrain"] = {
        "steps": args.steps1, "train_seconds": round(s1_s, 1),
        "dataset": "mini-obj365-surrogate (detection prompts)",
        "boxinst": boxinst_payload}
    with open(os.path.join(REPO, "BOXINST_RESULT.json"), "w") as f:
        json.dump(boxinst_payload, f, indent=1)
    del tr1  # keep only the on-disk checkpoint: the hand-off is real

    # ---- stage 2: image joint (detection + grounding), init from stage 1 -
    s2d_root = tempfile.mkdtemp(prefix="p3_coco_")
    s2g_root = tempfile.mkdtemp(prefix="p3_refcoco_")
    s2d = make_mini_coco(s2d_root, seed=0)
    s2g = make_mini_refcoco(s2g_root)
    d_train, d_cats = load_coco_json(s2d["train_json"], s2d["train_root"])
    d_val, _ = load_coco_json(s2d["val_json"], s2d["val_root"])
    g_train = load_refcoco_json(s2g["train_json"], s2g["train_root"])
    g_val = load_refcoco_json(s2g["val_json"], s2g["val_root"])
    cfg_img2 = build_tiny_cfg(args.steps2, min_size=224, max_size=352)
    m2d = UniDatasetMapper(cfg_img2.data, d_cats, tok, is_train=True,
                           with_masks=True, lsj=True, lsj_size=224,
                           lsj_min_scale=0.6, lsj_max_scale=1.4)
    m2g = UniDatasetMapper(cfg_img2.data, ["object"], tok, is_train=True,
                           with_masks=True, lsj=True, lsj_size=224,
                           lsj_min_scale=0.6, lsj_max_scale=1.4)
    loader2 = MultiDatasetLoader(
        [(d_train, m2d, 2, "detection"), (g_train, m2g, 2, "grounding")],
        [0.6, 0.4], seed=1, num_workers=2)
    t0 = time.time()
    tr2 = Trainer(cfg_img2, iter(loader2),
                  output_dir=tempfile.mkdtemp(prefix="p3_s2_out_"),
                  task="detection", has_masks=True, use_mesh=False,
                  log_period=100)
    restored, ok = CheckpointManager(
        os.path.join(s1_out, "checkpoints")).restore_params(
            tr2.state.params)
    assert ok, "stage-1 checkpoint not found on disk"
    tr2.state = tr2.state.replace(params=restored)
    print("[stage2] initialized from the stage-1 orbax checkpoint",
          flush=True)
    tr2.train()
    s2_s = time.time() - t0
    assert set(tr2._steps) >= {"detection", "grounding"}, tr2._steps

    eval_mapper = UniDatasetMapper(cfg_img2.data, d_cats, tok,
                                   is_train=False, with_masks=True)
    _, _, cmap = create_label_token_map(d_cats, tok,
                                        cfg_img2.data.max_text_len)
    det = DetectionEvaluator(tr2.model, cfg_img2, cmap,
                             with_masks=False).evaluate(
        tr2.state.params, d_val, eval_mapper, score_thr=0.05)
    g_eval_mapper = UniDatasetMapper(cfg_img2.data, ["object"], tok,
                                     is_train=False, with_masks=False)
    rec = evaluate_refcoco(tr2.model, cfg_img2, tr2.state.params, g_val,
                           g_eval_mapper)
    print(f"[stage2] det AP {det['AP']:.3f}  REC P@0.5 "
          f"{rec['P@0.5']:.3f}", flush=True)
    payload["stages"]["2_image_joint"] = {
        "steps": args.steps2, "train_seconds": round(s2_s, 1),
        "init": "stage-1 orbax checkpoint (restore_params)",
        "det_ap": round(float(det["AP"]), 4),
        "rec_p_at_50": round(float(rec["P@0.5"]), 4)}
    stage2_params = jax.tree_util.tree_map(np.asarray, tr2.state.params)
    del tr2

    # ---- stage 3: video joint (VIS + SOT), init via load_stage_weights ---
    vis_root = tempfile.mkdtemp(prefix="p3_vis_")
    sot_root = tempfile.mkdtemp(prefix="p3_sot_")
    visp = make_mini_ytvis(vis_root, length=6, max_objects=2)
    sotp = make_mini_ytvis(sot_root, length=8, max_objects=1, seed=11)
    vis_train, vis_cats = load_ytvis_json(visp["train_json"],
                                          visp["train_root"])
    vis_val, _ = load_ytvis_json(visp["val_json"], visp["val_root"])
    sot_train, _ = load_ytvis_json(sotp["train_json"], sotp["train_root"])
    sot_val, _ = load_ytvis_json(sotp["val_json"], sotp["val_root"])
    cfg_vid = build_tiny_cfg(args.steps3, frame_range=7, use_reid=True)
    # the REAL stage-3 template machinery: separate 4-channel template
    # backbone (inflated from the image backbone below) + feature fusion
    cfg_vid = dataclasses.replace(
        cfg_vid, sot=dataclasses.replace(
            cfg_vid.sot, extra_backbone_for_template=True,
            feature_fusion=True))
    mv = VideoPairMapper(cfg_vid.data, vis_cats, tok,
                         sampling_frame_range=5)
    ms = VideoPairMapper(cfg_vid.data, vis_cats, tok,
                         sampling_frame_range=7)
    loader3 = MultiDatasetLoader(
        [(vis_train, mv, 2, "detection"), (sot_train, ms, 2, "sot")],
        [0.65, 0.35], seed=2, num_workers=2)
    t0 = time.time()
    tr3 = Trainer(cfg_vid, iter(loader3),
                  output_dir=tempfile.mkdtemp(prefix="p3_s3_out_"),
                  task="detection", has_masks=True, use_mesh=False,
                  video=True, log_period=100)
    new_params, rep = load_stage_weights(tr3.state.params, stage2_params)
    assert rep["inflated"] >= 1, rep        # template conv1 3->4ch
    assert rep["remapped_template"] > 0, rep
    assert not rep["mismatched"], rep["mismatched"][:5]
    tr3.state = tr3.state.replace(params=new_params)
    print(f"[stage3] hand-off: loaded {rep['loaded']} leaves, inflated "
          f"{rep['inflated']}, template-remapped "
          f"{rep['remapped_template']}, {len(rep['missing'])} new-tower "
          f"leaves at init", flush=True)
    tr3.train()
    s3_s = time.time() - t0
    assert set(tr3._steps) >= {"detection", "sot"}, tr3._steps

    p = tr3.state.params
    vis_res = eval_vis(tr3.model, p, cfg_vid, vis_val, visp["val_json"],
                       vis_cats, 192, 256)
    sot_agg, jf = eval_sot_vos(tr3.model, p, cfg_vid, sot_val, 192, 256)
    print(f"[stage3] VIS mAP {vis_res['AP']:.3f}  SOT AUC "
          f"{sot_agg['AUC']:.3f}  VOS J&F {jf:.3f}", flush=True)
    payload["stages"]["3_video_joint"] = {
        "steps": args.steps3, "train_seconds": round(s3_s, 1),
        "init": "stage-2 weights via load_stage_weights "
                "(template backbone inflated 3->4ch)",
        "handoff": {"loaded": rep["loaded"], "inflated": rep["inflated"],
                    "remapped_template": rep["remapped_template"],
                    "new_tower_leaves": len(rep["missing"])},
        "vis_map": round(float(vis_res["AP"]), 4),
        "sot_auc": round(float(sot_agg["AUC"]), 4),
        "vos_jf": round(jf, 4)}

    payload["pipeline"] = (
        "obj365-surrogate pretrain -> orbax ckpt -> image joint "
        "(detection+grounding routed) -> load_stage_weights w/ 3->4ch "
        "template inflation -> video joint (VIS+SOT routed) -> "
        "det/REC/VIS/SOT/VOS metrics")
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
