#!/usr/bin/env python
"""Demo: detection / grounding on one image, or a frame-directory video —
per-frame detection/grounding, or SOT tracking from an initial box.

Parity: reference projects/UNINEXT/demo.py + predictor.py
(VisualizationDemo, incl. its --video-input mode; frames come from a
directory of images instead of cv2 video decode — no opencv in this stack).
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None, help="single-image demo")
    p.add_argument("--frames", default=None,
                   help="directory of video frames (video demo)")
    p.add_argument("--init-box", type=float, nargs=4, default=None,
                   help="x0 y0 x1 y1 on the first frame -> SOT tracking")
    p.add_argument("--prompt", default=None,
                   help="referring expression (grounding); default = COCO "
                        "class-name detection prompt")
    p.add_argument("--config", default="image_joint_r50")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--output", default="demo_out.png",
                   help="output png (--image) or directory (--frames)")
    p.add_argument("--score-thr", type=float, default=0.3)
    return p.parse_args()


def load_frame(path, cfg):
    from PIL import Image
    from uninext_tpu.data.coco import resize_shortest_edge, round_up
    img = Image.open(path).convert("RGB")
    w0, h0 = img.size
    h, w = resize_shortest_edge(h0, w0, cfg.data.min_size_test,
                                cfg.data.max_size_test)
    arr = np.asarray(img.resize((w, h), Image.BILINEAR), np.float32)
    arr = (arr - np.array(cfg.data.pixel_mean)) / np.array(cfg.data.pixel_std)
    Hb, Wb = round_up(h, 32), round_up(w, 32)
    padded = np.zeros((1, Hb, Wb, 3), np.float32)
    padded[0, :h, :w] = arr
    img_mask = np.ones((1, Hb, Wb), bool)
    img_mask[0, :h, :w] = False
    return img, padded, img_mask, np.array([[h, w]], np.int32), (h, w)


def draw_boxes(img, hw, boxes, scores, classes, names, thr):
    from PIL import Image, ImageDraw
    h, w = hw
    vis = img.resize((w, h), Image.BILINEAR)
    draw = ImageDraw.Draw(vis)
    kept = 0
    for b, s, c in zip(boxes, scores, classes):
        if s < thr:
            continue
        draw.rectangle([float(x) for x in b], outline=(255, 40, 40), width=2)
        draw.text((b[0] + 2, b[1] + 2), f"{names[int(c)][:18]} {s:.2f}",
                  fill=(255, 255, 0))
        kept += 1
    return vis, kept


def main():
    args = parse_args()
    if not args.image and not args.frames:
        raise SystemExit("give --image or --frames")

    import jax
    import jax.numpy as jnp
    from uninext_tpu import config as config_mod
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.models.detr import UninextDETR, init_all_paths
    from uninext_tpu.models.postprocess import postprocess_detection

    cfg = getattr(config_mod, args.config)()
    tok = BertTokenizer()

    if args.prompt:
        task = "grounding"
        t = tok(args.prompt, max_length=cfg.data.max_text_len)
        ids, mask = t["input_ids"], t["attention_mask"]
        cls_map = np.ones((1, cfg.data.max_text_len), bool)
        names = [args.prompt]
    else:
        task = "detection"
        from uninext_tpu.data.coco_categories import COCO_CATEGORIES
        names = COCO_CATEGORIES
        ids, mask, cls_map = create_label_token_map(
            names, tok, cfg.data.max_text_len)

    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    if args.checkpoint:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        try:
            params = {"params": ckptr.restore(args.checkpoint,
                                              target=params["params"])}
        except Exception:
            # image-stage checkpoints are a SUBTREE of the all-paths tree
            # (no template/reid branches): merge what the checkpoint has,
            # keep the untrained branches at init
            raw = ckptr.restore(args.checkpoint)
            raw = raw.get("params", raw)

            def merge(full, part):
                if isinstance(full, dict) and isinstance(part, dict):
                    return {k: (merge(v, part[k]) if k in part else v)
                            for k, v in full.items()}
                return part
            params = {"params": merge(params["params"], raw)}

    # ---- SOT video demo: track --init-box through the frames ----
    if args.frames and args.init_box is not None:
        from uninext_tpu.engine.sot_inference import SOTDriver
        paths = sorted(glob.glob(os.path.join(args.frames, "*")))
        imgs, hws, frames = [], [], []
        for p in paths:
            img, padded, img_mask, sizes, hw = load_frame(p, cfg)
            imgs.append(img)
            hws.append(hw)
            frames.append(jnp.asarray(padded))
        if len(set(hws)) != 1:
            raise SystemExit(f"--frames requires uniform frame sizes; got "
                             f"{sorted(set(hws))} (the SOT driver tracks "
                             "one static-resolution stream)")
        hw = hws[0]
        # --init-box is given in ORIGINAL first-frame pixels; the network
        # runs at the resized resolution
        w0, h0 = imgs[0].size
        sx, sy = hw[1] / w0, hw[0] / h0
        init = np.asarray(args.init_box, np.float32) * [sx, sy, sx, sy]
        drv = SOTDriver(model, params["params"], cfg,
                        frames[0].shape[1], frames[0].shape[2])
        boxes, _ = drv.run_video(frames, jnp.asarray(img_mask),
                                 jnp.asarray(sizes), init)
        os.makedirs(args.output, exist_ok=True)
        for i, (img, b) in enumerate(zip(imgs, boxes)):
            vis, _ = draw_boxes(img, hw, [b], [1.0], [0], ["target"], 0.0)
            vis.save(os.path.join(args.output, f"{i:05d}.png"))
        print(f"tracked {len(boxes)} frames -> {args.output}/")
        return

    # ---- per-frame detection / grounding (single image or video) ----
    step = jax.jit(lambda p, im, msk, sz: model.apply(
        p, im, msk, sz, jnp.asarray(ids[None]), jnp.asarray(mask[None]),
        task=task, train=False))

    def detect(path):
        img, padded, img_mask, sizes, hw = load_frame(path, cfg)
        out = step(params, jnp.asarray(padded), jnp.asarray(img_mask),
                   jnp.asarray(sizes))
        post = postprocess_detection(
            {k: out[k] for k in ("pred_logits", "pred_boxes", "pred_boxious")
             if k in out},
            jnp.asarray(cls_map),
            max_inst=1 if task == "grounding" else 100,
            use_nms=(task == "detection"))
        h, w = hw
        boxes = np.asarray(post["boxes"][0]) * [w, h, w, h]
        return draw_boxes(img, hw, boxes, np.asarray(post["scores"][0]),
                          np.asarray(post["classes"][0]), names,
                          args.score_thr)

    if args.image:
        vis, kept = detect(args.image)
        vis.save(args.output)
        print(f"saved {args.output} with {kept} detections "
              f">= {args.score_thr}")
    else:
        paths = sorted(glob.glob(os.path.join(args.frames, "*")))
        os.makedirs(args.output, exist_ok=True)
        for i, p in enumerate(paths):
            vis, kept = detect(p)
            vis.save(os.path.join(args.output, f"{i:05d}.png"))
        print(f"annotated {len(paths)} frames -> {args.output}/")


if __name__ == "__main__":
    main()
