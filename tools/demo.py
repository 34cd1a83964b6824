#!/usr/bin/env python
"""Image demo: detection / grounding on one image, draw boxes+masks.

Parity: reference projects/UNINEXT/demo.py + predictor.py (VisualizationDemo).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True)
    p.add_argument("--prompt", default=None,
                   help="referring expression (grounding); default = COCO "
                        "class-name detection prompt")
    p.add_argument("--config", default="image_joint_r50")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--output", default="demo_out.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image, ImageDraw
    from uninext_tpu import config as config_mod
    from uninext_tpu.data.coco import resize_shortest_edge, round_up
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.models.detr import UninextDETR
    from uninext_tpu.models.postprocess import postprocess_detection

    cfg = getattr(config_mod, args.config)()
    tok = BertTokenizer()
    img = Image.open(args.image).convert("RGB")
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
    sizes = np.array([[h, w]], np.int32)

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
    init_fn = jax.jit(lambda r: model.init(
        {"params": r}, jnp.asarray(padded), jnp.asarray(img_mask),
        jnp.asarray(sizes), jnp.asarray(ids[None]), jnp.asarray(mask[None]),
        task=task, train=False))
    params = init_fn(jax.random.PRNGKey(0))
    if args.checkpoint:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        params = {"params": ckptr.restore(args.checkpoint,
                                          target=params["params"])}

    out = jax.jit(lambda p: model.apply(
        p, jnp.asarray(padded), jnp.asarray(img_mask), jnp.asarray(sizes),
        jnp.asarray(ids[None]), jnp.asarray(mask[None]), task=task,
        train=False))(params)
    post = postprocess_detection(
        {k: out[k] for k in ("pred_logits", "pred_boxes", "pred_boxious")
         if k in out},
        jnp.asarray(cls_map),
        max_inst=1 if task == "grounding" else 100,
        use_nms=(task == "detection"))

    boxes = np.asarray(post["boxes"][0]) * [w, h, w, h]
    scores = np.asarray(post["scores"][0])
    classes = np.asarray(post["classes"][0])
    vis = img.resize((w, h), Image.BILINEAR)
    draw = ImageDraw.Draw(vis)
    kept = 0
    for b, s, c in zip(boxes, scores, classes):
        if s < args.score_thr:
            continue
        draw.rectangle(b.tolist(), outline=(255, 40, 40), width=2)
        draw.text((b[0] + 2, b[1] + 2), f"{names[int(c)][:18]} {s:.2f}",
                  fill=(255, 255, 0))
        kept += 1
    vis.save(args.output)
    print(f"saved {args.output} with {kept} detections >= {args.score_thr}")


if __name__ == "__main__":
    main()
