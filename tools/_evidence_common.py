"""Shared helpers for the end-to-end evidence tools (real_*_check.py):
tiny-config builder, frame loading/normalization, gt track rescaling,
prediction category-id remapping, and the per-video SOT/VOS evaluation
loop. One copy — eval_video.py's full-dataset CLI has its own streaming
variants of these."""
import dataclasses
import json

import numpy as np

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


def build_tiny_cfg(steps: int, min_size=192, max_size=256,
                   frame_range=None, use_reid=False):
    """Overfit-friendly tiny config with a single static resolution bucket
    and a short high-LR schedule."""
    from uninext_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    data = dataclasses.replace(
        cfg.data, max_insts=8, max_text_len=32,
        min_size_train=(min_size,), max_size_train=max_size,
        min_size_test=min_size, max_size_test=max_size,
        **({"sampling_frame_range": frame_range} if frame_range else {}))
    return dataclasses.replace(
        cfg, use_reid=use_reid, data=data,
        solver=dataclasses.replace(
            cfg.solver, base_lr=3e-4, lang_lr=3e-4, vl_lr=3e-4,
            backbone_multiplier=1.0, warmup_iters=40, grad_clip=1.0,
            max_iter=steps, checkpoint_period=10 ** 9,
            steps=(int(steps * 0.8),)))


def frames_of(rec):
    """Video record -> list of (1, H, W, 3) normalized device frames
    (frames are generated at the network bucket size)."""
    import jax.numpy as jnp
    from PIL import Image
    out = []
    for fp in rec["file_names"]:
        img = (np.asarray(Image.open(fp).convert("RGB"), np.float32)
               - MEAN) / STD
        out.append(jnp.asarray(img[None]))
    return out


def remap_result_ids(results, gt):
    """Prediction category ids (contiguous-index+1, video_output_to_ytvis)
    -> the gt json's dataset ids."""
    id_map = {i + 1: c["id"] for i, c in enumerate(
        sorted(gt["categories"], key=lambda c: c["id"]))}
    return [{**r, "category_id": id_map.get(r["category_id"],
                                            r["category_id"])}
            for r in results]


def scaled_track_gt(rec, H, W):
    """First track of a video record -> (gt_xywh (T,4) at network scale,
    init_xyxy, per-frame boolean gt masks)."""
    from uninext_tpu.data.masks import polygons_to_mask
    track = rec["tracks"][0]
    sx, sy = W / rec["width"], H / rec["height"]
    gt_xywh = np.array([[b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy]
                        for b in track["bboxes"]], np.float32)
    init_xyxy = np.array([gt_xywh[0, 0], gt_xywh[0, 1],
                          gt_xywh[0, 0] + gt_xywh[0, 2],
                          gt_xywh[0, 1] + gt_xywh[0, 3]], np.float32)
    gt_masks = []
    for fi in range(rec["length"]):
        segs = track["segmentations"][fi]
        m = polygons_to_mask(
            [np.array(s) * np.array([sx, sy] * (len(s) // 2))
             for s in segs], H, W) if segs else np.zeros((H, W), np.uint8)
        gt_masks.append(m.astype(bool))
    return gt_xywh, init_xyxy, gt_masks


def eval_sot_vos(model, params, cfg, val_recs, H, W, verbose=True):
    """Track + segment every val video from its first-frame gt; returns
    ({"AUC","P","Pnorm"}, mean J&F)."""
    import jax.numpy as jnp
    from uninext_tpu.engine.sot_inference import SOTDriver, VOSDriver
    from uninext_tpu.evaluation.davis_eval import evaluate_davis
    from uninext_tpu.evaluation.sot_eval import (evaluate_sot,
                                                 evaluate_sot_dataset)
    img_masks = jnp.zeros((1, H, W), bool)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    sot_drv = SOTDriver(model, params, cfg, H, W)
    vos_drv = VOSDriver(model, params, cfg, H, W)
    per_seq, jf_all = {}, []
    for rec in val_recs:
        frames = frames_of(rec)
        gt_xywh, init_xyxy, gt_masks = scaled_track_gt(rec, H, W)
        boxes, _ = sot_drv.run_video(frames, img_masks, sizes, init_xyxy)
        name = f"vid{rec['video_id']}"
        per_seq[name] = {"pred": np.stack(
            [boxes[:, 0], boxes[:, 1], boxes[:, 2] - boxes[:, 0],
             boxes[:, 3] - boxes[:, 1]], 1), "gt": gt_xywh}
        init = {1: {"frame": 0, "mask": gt_masks[0].astype(np.float32),
                    "box_xyxy": init_xyxy}}
        labels = vos_drv.run_video(frames, img_masks, sizes, init)
        jf = evaluate_davis({1: [l == 1 for l in labels]},
                            {1: gt_masks})["J&F"]
        jf_all.append(jf)
        if verbose:
            m = evaluate_sot(per_seq[name]["pred"], gt_xywh)
            print(f"[sot] {name} AUC={m['AUC']:.3f} P={m['P']:.3f}  "
                  f"[vos] J&F={jf:.3f}", flush=True)
    return evaluate_sot_dataset(per_seq), float(np.mean(jf_all))


def eval_mot(model, params, cfg, val_recs, cats, H, W):
    """QDTrack association over every val video; returns pooled CLEAR-MOT
    metrics (MOTA/IDF1) across sequences."""
    import jax.numpy as jnp
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.mot_inference import MOTDriver
    from uninext_tpu.evaluation.mot_eval import (evaluate_mot,
                                                 pool_mot_metrics)
    tok = BertTokenizer()
    tids, tmask, cmap = create_label_token_map(cats, tok,
                                               cfg.data.max_text_len)
    drv = MOTDriver(model, params, cfg, jnp.asarray(cmap), H, W)
    img_masks = jnp.zeros((1, H, W), bool)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    per_seq = []
    for rec in val_recs:
        pred = drv.run_video(frames_of(rec), img_masks, sizes,
                             jnp.asarray(tids[None]), jnp.asarray(tmask[None]),
                             ori_size=(rec["height"], rec["width"]))
        gt_frames, pred_frames = [], []
        for fi in range(rec["length"]):
            ids, boxes = [], []
            for ti, tr in enumerate(rec["tracks"]):
                b = tr["bboxes"][fi] if fi < len(tr["bboxes"]) else None
                if b is not None:
                    ids.append(ti)
                    boxes.append([b[0], b[1], b[0] + b[2], b[1] + b[3]])
            gt_frames.append({"ids": np.array(ids, np.int64),
                              "boxes": np.array(boxes, np.float64).reshape(
                                  -1, 4)})
            dets = pred[fi]
            pred_frames.append({
                "ids": np.array([d["id"] for d in dets], np.int64),
                "boxes": np.array([d["box_xyxy"] for d in dets],
                                  np.float64).reshape(-1, 4)})
        per_seq.append(evaluate_mot(gt_frames, pred_frames))
    return pool_mot_metrics(per_seq)


def eval_rvos(model, params, cfg, val_recs, H, W):
    """Referring VOS: expression prompt -> per-frame top-1 mask -> J&F vs
    the referred track's gt masks. val_recs from
    load_ytvis_json(..., has_expression=True)."""
    import jax
    import jax.numpy as jnp
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.mot_inference import RVOSDriver
    from uninext_tpu.evaluation.davis_eval import evaluate_davis
    from uninext_tpu.models.detr import UninextDETR
    tok = BertTokenizer()
    encode = jax.jit(lambda p, a, b: model.apply(
        {"params": p}, a, b, method=UninextDETR.encode_text))
    drv = RVOSDriver(model, params, cfg, H, W)
    img_masks = jnp.zeros((1, H, W), bool)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    jf_all = []
    for rec in val_recs:
        expr = rec["expressions"][0]
        t = tok(expr, max_length=cfg.data.max_text_len)
        lang = encode(params, jnp.asarray(t["input_ids"][None]),
                      jnp.asarray(t["attention_mask"][None]))
        pred = drv.run_video(frames_of(rec), img_masks, sizes,
                             lang["hidden"], lang["masks"],
                             ori_size=(rec["height"], rec["width"]))
        _, _, gt_masks = scaled_track_gt(rec, rec["height"], rec["width"])
        jf = evaluate_davis({1: [m.astype(bool) for m in pred]},
                            {1: gt_masks})["J&F"]
        jf_all.append(jf)
    return float(np.mean(jf_all))


def eval_vis(model, params, cfg, val_recs, val_json, cats, H, W):
    """Stream every val video through the IDOL driver, score offline track
    mAP; returns the metric dict."""
    import jax.numpy as jnp
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.video_inference import VISDriver
    from uninext_tpu.evaluation.ytvis_eval import (evaluate_ytvis,
                                                   video_output_to_ytvis)
    tok = BertTokenizer()
    tids, tmask, cmap = create_label_token_map(cats, tok,
                                               cfg.data.max_text_len)
    drv = VISDriver(model, params, cfg, jnp.asarray(cmap), H, W)
    img_masks = jnp.zeros((1, H, W), bool)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    results = []
    for rec in val_recs:
        out = drv.run_video(frames_of(rec), img_masks, sizes,
                            jnp.asarray(tids[None]), jnp.asarray(tmask[None]),
                            ori_size=(rec["height"], rec["width"]))
        results.extend(video_output_to_ytvis(rec["video_id"], out))
    with open(val_json) as f:
        gt = json.load(f)
    return evaluate_ytvis(remap_result_ids(results, gt), gt)
