"""Video-task evaluation CLI — the reference's eval-vid workflow.

Mirrors running the reference with projects/UNINEXT/configs/eval-vid/*.yaml
(uninext_vid.py inference paths): pick an eval preset (config.EVAL_PRESETS,
which encode the per-dataset test sizes of those 17 yamls), walk a dataset
directory in its OFFICIAL on-disk layout, stream every video through the
matching driver, write the official output format, and — when ground truth
is present — score with the offline evaluators.

  --task vis    YTVIS json layout  -> results.json (+ server zip), mAP json
  --task sot    LaSOT layout       -> <vid>.txt + <vid>_time.txt, AUC/P
  --task vos    DAVIS layout       -> palette PNGs, J&F
  --task mot    BDD box-track      -> scalabel json

Usage:
  python tools/eval_video.py --task vos --data-root datasets/DAVIS \
      --config video_joint_r50 --weights model.pth --output-dir out/
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True,
                   choices=["vis", "vis21", "ovis", "sot", "vos", "mot",
                            "mots", "rvos"])
    p.add_argument("--data-root", required=True)
    p.add_argument("--json", help="annotation json (vis/rvos)")
    p.add_argument("--config", default="video_joint_r50")
    p.add_argument("--weights", help=".pth reference checkpoint to convert")
    p.add_argument("--resume-dir", help="orbax checkpoint dir")
    p.add_argument("--output-dir", default="eval_out")
    p.add_argument("--bucket", type=int, nargs=2, default=None,
                   help="static (H, W) network bucket; default from preset")
    p.add_argument("--max-videos", type=int, default=0)
    p.add_argument("--rvos-temporal-weight", type=float, default=None,
                   help="rvos only: blend selection with reid cosine to "
                        "the previous frame's pick (round 5; 0/None = "
                        "reference frame-independent scoring)")
    p.add_argument("--dump-dets", metavar="DIR",
                   help="mot only: also cache per-sequence raw detections "
                        "(+gt when a BDD labels dir sits next to the "
                        "frames) as DIR/<vid>.npz for "
                        "tools/grid_search_track.py")
    return p.parse_args()


def norm_frame(path, H, W):
    from PIL import Image
    from uninext_tpu.data.coco import resize_shortest_edge
    img = np.asarray(Image.open(path).convert("RGB"), np.float32)
    h0, w0 = img.shape[:2]
    h, w = resize_shortest_edge(h0, w0, H, W)
    img = np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
        (w, h), Image.BILINEAR), np.float32)
    out = np.zeros((H, W, 3), np.float32)
    out[:h, :w] = (img - MEAN) / STD
    return out, (h, w), (h0, w0)


def build(args):
    import jax
    import dataclasses
    from uninext_tpu import config as C
    from uninext_tpu.models.detr import UninextDETR, init_all_paths

    base = getattr(C, args.config)()
    cfg, datasets, with_mask = C.eval_config(base, args.task)
    if args.bucket:
        H, W = args.bucket
    else:
        H = cfg.data.min_size_test
        W = min(cfg.data.max_size_test, (H * 1333) // 800)
        W = ((W + 31) // 32) * 32
        H = ((H + 31) // 32) * 32
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))["params"]
    if args.weights:
        from uninext_tpu.engine.convert import load_torch_checkpoint
        params = load_torch_checkpoint(args.weights, params)
    elif args.resume_dir:
        from uninext_tpu.engine.checkpoint import CheckpointManager
        params, ok = CheckpointManager(args.resume_dir).restore_params(params)
        if not ok:
            raise SystemExit(f"no checkpoint in {args.resume_dir}")
    return model, params, cfg, (H, W), with_mask


def frames_of(paths, H, W):
    import jax.numpy as jnp
    frames, hw, ori = [], None, None
    for p in paths:
        f, hw, ori = norm_frame(p, H, W)
        frames.append(jnp.asarray(f[None]))
    h, w = hw
    img_masks = jnp.asarray(
        ~(np.arange(H)[:, None] < h) | ~(np.arange(W)[None] < w))[None]
    sizes = jnp.asarray(np.array([[h, w]], np.int32))
    return frames, img_masks, sizes, hw, ori


def run_vis(args, model, params, cfg, HW):
    import jax.numpy as jnp
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import load_ytvis_json
    from uninext_tpu.engine.video_inference import VISDriver
    from uninext_tpu.evaluation.ytvis_eval import (save_ytvis_results,
                                                   video_output_to_ytvis)
    from uninext_tpu.evaluation.bdd_submit import package_ytvis_submission

    H, W = HW
    js = args.json or os.path.join(args.data_root, "valid.json")
    records, cats = load_ytvis_json(js, os.path.join(args.data_root,
                                                     "JPEGImages"))
    tok = BertTokenizer()
    tids, tmask, cmap = create_label_token_map(cats, tok,
                                               cfg.data.max_text_len)
    drv = VISDriver(model, params, cfg, jnp.asarray(cmap), H, W)
    results = []
    for i, rec in enumerate(records):
        if args.max_videos and i >= args.max_videos:
            break
        frames, img_masks, sizes, _, _ = frames_of(rec["file_names"], H, W)
        t0 = time.perf_counter()
        out = drv.run_video(frames, img_masks, sizes, jnp.asarray(tids[None]),
                            jnp.asarray(tmask[None]),
                            ori_size=(rec["height"], rec["width"]))
        print(f"[vis] video {rec['video_id']} "
              f"{len(frames) / (time.perf_counter() - t0):.1f} FPS")
        results.extend(video_output_to_ytvis(rec["video_id"], out))
    # predictions carry contiguous-index+1 category ids
    # (video_output_to_ytvis); map back to the dataset's ids before writing
    # the submission (identity for official YTVIS, whose ids ARE 1..K)
    with open(js) as f:
        gt = json.load(f)
    id_map = {i + 1: c["id"] for i, c in enumerate(
        sorted(gt["categories"], key=lambda c: c["id"]))}
    results = [{**r, "category_id": id_map.get(r["category_id"],
                                               r["category_id"])}
               for r in results]
    path = save_ytvis_results(results, args.output_dir)
    package_ytvis_submission(results,
                             os.path.join(args.output_dir, "submission.zip"))
    print(f"[vis] {len(results)} tracks -> {path}")
    # score locally when the json carries gt tracks (train/minival splits;
    # the official valid.json has none — server-only, as in the reference)
    if any(a.get("segmentations") for a in gt.get("annotations", [])):
        from uninext_tpu.evaluation.ytvis_eval import evaluate_ytvis
        if args.max_videos:
            # restrict gt to the PROCESSED videos (not to videos with
            # results — a total miss must stay in the recall denominator)
            keep = {r["video_id"] for r in records[:args.max_videos]}
            gt = {**gt,
                  "videos": [v for v in gt["videos"] if v["id"] in keep],
                  "annotations": [a for a in gt["annotations"]
                                  if a["video_id"] in keep]}
        res = evaluate_ytvis(results, gt)
        print(json.dumps({"vis_" + k: round(v, 4)
                          for k, v in res.items()}, indent=1))


def run_sot(args, model, params, cfg, HW):
    import jax.numpy as jnp
    from uninext_tpu.data.sot_datasets import load_lasot
    from uninext_tpu.engine.sot_inference import SOTDriver
    from uninext_tpu.evaluation.sot_eval import (evaluate_sot,
                                                 evaluate_sot_dataset,
                                                 save_sot_results)
    H, W = HW
    seqs = load_lasot(args.data_root)
    drv = SOTDriver(model, params, cfg, H, W)
    per_seq = {}
    for i, seq in enumerate(seqs):
        if args.max_videos and i >= args.max_videos:
            break
        gt = np.asarray(seq["gt_xywh"], np.float32)     # original pixels
        # task-level resume: a finished <vid>.txt with one box per frame is
        # reused instead of re-running the model (reference
        # uninext_vid.py:469-471 skips already-saved videos)
        done = os.path.join(args.output_dir, f"{seq['name']}.txt")
        if os.path.exists(done):
            prev = np.loadtxt(done, delimiter=",", ndmin=2)
            if len(prev) == len(seq["frames"]):
                print(f"[sot] {seq['name']}: resuming from {done}")
                pred_xywh = prev.astype(np.float32)
                per_seq[seq["name"]] = evaluate_sot(pred_xywh, gt,
                                                    seq.get("visible"))
                continue
        frames, img_masks, sizes, (h, w), (h0, w0) = frames_of(
            seq["frames"], H, W)
        sx, sy = w / w0, h / h0
        init = gt[0] * [sx, sy, sx, sy]
        init_xyxy = np.array([init[0], init[1],
                              init[0] + init[2], init[1] + init[3]])
        boxes, times = drv.run_video(frames, img_masks, sizes, init_xyxy)
        boxes_ori = boxes / [sx, sy, sx, sy]
        save_sot_results(args.output_dir, seq["name"], boxes_ori, times)
        pred_xywh = np.stack([boxes_ori[:, 0], boxes_ori[:, 1],
                              boxes_ori[:, 2] - boxes_ori[:, 0],
                              boxes_ori[:, 3] - boxes_ori[:, 1]], 1)
        per_seq[seq["name"]] = evaluate_sot(pred_xywh, gt,
                                    seq.get("visible"))
        print(f"[sot] {seq['name']} auc={per_seq[seq['name']]['auc']:.3f}")
    agg = evaluate_sot_dataset(per_seq)
    print(json.dumps({k: float(v) for k, v in agg.items()}, indent=1))


def run_vos(args, model, params, cfg, HW):
    from uninext_tpu.engine.sot_inference import VOSDriver
    from uninext_tpu.evaluation.davis_eval import (evaluate_davis,
                                                   load_davis_png,
                                                   save_davis_png)
    H, W = HW
    img_root = os.path.join(args.data_root, "JPEGImages", "480p")
    ann_root = os.path.join(args.data_root, "Annotations", "480p")
    vids = sorted(os.listdir(img_root))
    drv = VOSDriver(model, params, cfg, H, W)
    js = {}
    for i, vid in enumerate(vids):
        if args.max_videos and i >= args.max_videos:
            break
        fns = sorted(os.listdir(os.path.join(img_root, vid)))
        frames, img_masks, sizes, (h, w), (h0, w0) = frames_of(
            [os.path.join(img_root, vid, f) for f in fns], H, W)
        # per-object init from the annotation of each object's first frame
        anns = sorted(os.listdir(os.path.join(ann_root, vid)))
        init = {}
        iy = (np.arange(h) * h0) // h
        ix = (np.arange(w) * w0) // w
        for fi, a in enumerate(anns):
            am = load_davis_png(os.path.join(ann_root, vid, a))
            for oid in np.unique(am):
                if oid == 0 or int(oid) in init:
                    continue
                ys, xs = np.nonzero(am == oid)
                gm = np.zeros((H, W), np.float32)
                gm[:h, :w] = (am == oid)[iy][:, ix]
                # exclusive max edge (+1), matching the driver's 3f-refresh
                # boxes (sot_inference.py) and the reference mask->box rule
                box = np.array([xs.min() * w / w0, ys.min() * h / h0,
                                (xs.max() + 1) * w / w0,
                                (ys.max() + 1) * h / h0], np.float32)
                init[int(oid)] = {"frame": fi, "mask": gm, "box_xyxy": box}
        labels = drv.run_video(frames, img_masks, sizes, init)
        gt_by_obj, pred_by_obj = {}, {}
        # submission PNGs go out at the annotation's ORIGINAL resolution
        # (the official evaluators/servers reject network-scale frames);
        # nearest-neighbor upsample of the [:h,:w] content region
        oy = (np.arange(h0) * h) // h0
        ox = (np.arange(w0) * w) // w0
        for fi, lab in enumerate(labels):
            save_davis_png(lab[oy][:, ox],
                           os.path.join(args.output_dir, vid,
                                        fns[fi].replace(".jpg", ".png")))
        # score frames that have gt annotations
        for fi, a in enumerate(anns):
            if fi >= len(labels):
                break
            am = load_davis_png(os.path.join(ann_root, vid, a))
            am = am[iy][:, ix]                    # network scale
            for oid in init:
                gt_by_obj.setdefault(oid, []).append(am == oid)
                pred_by_obj.setdefault(oid, []).append(
                    labels[fi][:h, :w] == oid)
        res = evaluate_davis(pred_by_obj, gt_by_obj)
        js[vid] = {k: float(v) for k, v in res.items()}
        print(f"[vos] {vid} {js[vid]}")
    if js:
        mean_jf = float(np.mean([v["J&F"] for v in js.values()]))
        print(json.dumps({"J&F": mean_jf, "per_video": js}, indent=1))


def _load_bdd_gt(frames_root, vid, fns):
    """Per-frame gt {ids, boxes} from a BDD scalabel labels json when one
    sits next to the frame dirs (<root>/../labels/<vid>.json — the official
    box_track_20 layout); None otherwise."""
    lab = os.path.join(os.path.dirname(frames_root.rstrip("/")),
                       "labels", f"{vid}.json")
    if not os.path.exists(lab):
        return None
    with open(lab) as f:
        recs = json.load(f)
    by_name = {r["name"]: r for r in recs}
    gt = []
    for fn in fns:
        r = by_name.get(fn, {})
        ids, boxes = [], []
        for l in r.get("labels", []):
            b = l.get("box2d")
            if not b:
                continue
            ids.append(int(l["id"]))
            boxes.append([b["x1"], b["y1"], b["x2"], b["y2"]])
        gt.append({"ids": np.array(ids, np.int64),
                   "boxes": np.array(boxes, np.float32).reshape(-1, 4)})
    return gt


def run_mot(args, model, params, cfg, HW, with_masks=False):
    """MOT (box_track json) or, with_masks, MOTS (seg_track: RGBA bitmask
    PNGs per frame + json) in BDD100K submission formats — the reference's
    bdd_box_track / bdd_seg_track eval-vid configs."""
    import jax.numpy as jnp
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.mot_inference import MOTDriver
    from uninext_tpu.evaluation.bdd_submit import (box_track_to_bdd,
                                                   save_bdd_json,
                                                   seg_track_to_bdd)
    from uninext_tpu.evaluation.bdd_submit import BDD_CATEGORIES
    H, W = HW
    tok = BertTokenizer()
    tids, tmask, cmap = create_label_token_map(list(BDD_CATEGORIES), tok,
                                               cfg.data.max_text_len)
    drv = MOTDriver(model, params, cfg, jnp.asarray(cmap), H, W,
                    with_masks=with_masks)
    root = args.data_root
    vids = sorted(os.listdir(root))
    all_frames = []
    for i, vid in enumerate(vids):
        if args.max_videos and i >= args.max_videos:
            break
        fns = sorted(os.listdir(os.path.join(root, vid)))
        frames, img_masks, sizes, _, ori = frames_of(
            [os.path.join(root, vid, f) for f in fns], H, W)
        raw = drv.detect_video(frames, img_masks, sizes,
                               jnp.asarray(tids[None]),
                               jnp.asarray(tmask[None]))
        image_size = (int(sizes[0, 0]), int(sizes[0, 1]))
        if args.dump_dets:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from grid_search_track import save_detections
            gt = _load_bdd_gt(root, vid, fns)
            save_detections(os.path.join(args.dump_dets, f"{vid}.npz"),
                            raw, image_size, ori, gt_frames=gt,
                            select_thr=drv.select_thr)
        from uninext_tpu.engine.mot_inference import associate
        tr = cfg.track
        per_frame = associate(raw, image_size, ori,
                              with_masks=with_masks,
                              init_score_thr=tr.init_score_thr,
                              obj_score_thr=tr.obj_score_thr)
        all_frames.extend(box_track_to_bdd(per_frame, fns, vid))
        if with_masks:
            seg_track_to_bdd(per_frame,
                             [os.path.join(vid, f) for f in fns],
                             os.path.join(args.output_dir, "seg_track"),
                             (int(ori[0]), int(ori[1])))
        print(f"[mot] {vid}: {sum(len(f['labels']) for f in all_frames)} dets")
    path = save_bdd_json(all_frames,
                         os.path.join(args.output_dir, "box_track.json"))
    print(f"[mot] -> {path}" + (
        f" + seg_track PNGs in {args.output_dir}/seg_track"
        if with_masks else ""))


def run_rvos(args, model, params, cfg, HW):
    """Ref-Youtube-VOS-style eval: per (video, expression) streaming top-1
    masks -> submission PNGs Annotations/<vid>/<exp_idx>/<frame>.png
    (reference inference_rvos, uninext_vid.py:1293-1358; the official
    server consumes exactly this layout). When the json also carries the
    referred tracks' segmentations (our mini fixtures; Ref-DAVIS), a mean
    J&F is printed."""
    import jax
    import jax.numpy as jnp
    from uninext_tpu.data.masks import polygons_to_mask
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import load_ytvis_json
    from uninext_tpu.engine.mot_inference import RVOSDriver
    from uninext_tpu.evaluation.davis_eval import evaluate_davis, \
        save_davis_png
    from uninext_tpu.models.detr import UninextDETR
    H, W = HW
    recs, _ = load_ytvis_json(args.json, args.data_root,
                              has_expression=True)
    tok = BertTokenizer()
    encode = jax.jit(lambda p, a, b: model.apply(
        {"params": p}, a, b, method=UninextDETR.encode_text))
    drv = RVOSDriver(model, params, cfg, H, W)
    jf_all = []
    for i, rec in enumerate(recs):
        if args.max_videos and i >= args.max_videos:
            break
        frames, img_masks, sizes, _, (h0, w0) = frames_of(
            rec["file_names"], H, W)
        vname = os.path.basename(os.path.dirname(rec["file_names"][0]))
        for ei, expr in enumerate(rec["expressions"] or []):
            t = tok(expr, max_length=cfg.data.max_text_len)
            lang = encode(params, jnp.asarray(t["input_ids"][None]),
                          jnp.asarray(t["attention_mask"][None]))
            masks = drv.run_video(frames, img_masks, sizes,
                                  lang["hidden"], lang["masks"],
                                  ori_size=(h0, w0))
            for fi, m in enumerate(masks):
                fn = os.path.splitext(os.path.basename(
                    rec["file_names"][fi]))[0] + ".png"
                save_davis_png(m.astype(np.uint8), os.path.join(
                    args.output_dir, "Annotations", vname, str(ei), fn))
            if rec["tracks"]:
                gt = []
                for fi in range(rec["length"]):
                    segs = rec["tracks"][0]["segmentations"][fi]
                    gt.append(polygons_to_mask(
                        [np.asarray(s, np.float64) for s in segs], h0, w0
                    ).astype(bool) if segs else np.zeros((h0, w0), bool))
                jf = evaluate_davis({1: [m.astype(bool) for m in masks]},
                                    {1: gt})["J&F"]
                jf_all.append(jf)
                print(f"[rvos] {vname}/{ei} '{expr}' J&F={jf:.3f}")
            else:
                print(f"[rvos] {vname}/{ei} '{expr}' ({len(masks)} frames)")
    if jf_all:
        print(f"[rvos] mean J&F over {len(jf_all)} (video, expr): "
              f"{float(np.mean(jf_all)):.4f}")


def main():
    args = parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    model, params, cfg, HW, _ = build(args)
    if args.rvos_temporal_weight is not None:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, rvos_temporal_weight=args.rvos_temporal_weight)
    if args.task in ("vis", "vis21", "ovis"):
        run_vis(args, model, params, cfg, HW)
    elif args.task == "sot":
        run_sot(args, model, params, cfg, HW)
    elif args.task == "vos":
        run_vos(args, model, params, cfg, HW)
    elif args.task in ("mot", "mots"):
        run_mot(args, model, params, cfg, HW,
                with_masks=args.task == "mots")
    else:
        run_rvos(args, model, params, cfg, HW)


if __name__ == "__main__":
    main()
