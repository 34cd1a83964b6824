"""Dataset evaluation loop: jitted serve over a dataset -> evaluators.

Parity: detectron2 inference_on_dataset (evaluation/evaluator.py) +
UNINEXT_IMG eval branch (uninext_img.py:257-306): bs=1 loader, per-image
top-k/NMS postprocess, resize to original resolution, COCO/RefCOCO metrics.
Multi-host: each process evaluates its shard; results concatenate on host
(the reference's all_gather merge becomes a trivial list merge because
evaluation state lives on host).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UninextConfig
from ..data.coco import UniDatasetMapper
from ..evaluation.coco_eval import COCOEvaluator, refcoco_metrics
from ..models.detr import UninextDETR, feature_shapes
from ..models.postprocess import postprocess_detection


class DetectionEvaluator:
    """COCO-style evaluation of the image detection/instseg path."""

    def __init__(self, model: UninextDETR, cfg: UninextConfig,
                 cls_token_map: np.ndarray, with_masks: bool = False):
        self.model = model
        self.cfg = cfg
        self.cls_token_map = jnp.asarray(cls_token_map)
        self.with_masks = with_masks
        self._steps: Dict = {}

    def _step_for(self, H: int, W: int):
        key = (H, W)
        if key in self._steps:
            return self._steps[key]
        model, cfg = self.model, self.cfg
        shapes = feature_shapes(cfg.transformer.num_feature_levels, H, W)

        @jax.jit
        def step(params, image, img_mask, sizes, tids, tmask):
            out = model.apply({"params": params}, image, img_mask, sizes,
                              tids, tmask, task="detection", train=False)
            post = postprocess_detection(
                {k: out[k] for k in ("pred_logits", "pred_boxes",
                                     "pred_boxious") if k in out},
                self.cls_token_map, use_nms=cfg.loss.ota)
            if self.with_masks:
                hs_sel = jnp.take_along_axis(
                    out["hs"], post["query_idx"][..., None], axis=1)
                ref_sel = jnp.take_along_axis(
                    out["base_reference"], post["query_idx"][..., None],
                    axis=1)
                post["mask_logits"] = model.apply(
                    {"params": params}, out["memory"], shapes, hs_sel,
                    ref_sel, sizes, method=UninextDETR.predict_masks)
            return post

        self._steps[key] = step
        return step

    def _map_step_for(self, H: int, W: int):
        """lax.map of the per-image step over a stacked group: ONE device
        dispatch per bucket instead of one per image (round 5 — through
        this sandbox's tunnel, per-image dispatch made a 48-image eval
        cost ~25 minutes; batched it is one round-trip)."""
        key = ("map", H, W)
        if key in self._steps:
            return self._steps[key]
        step = self._step_for(H, W)

        @jax.jit
        def map_step(params, images, masks, sizes, tids, tmasks):
            return jax.lax.map(
                lambda xs: step.__wrapped__(params, *xs),
                (images, masks, sizes, tids, tmasks))

        self._steps[key] = map_step
        return map_step

    def evaluate(self, params, records: Sequence[Dict],
                 mapper: UniDatasetMapper,
                 score_thr: float = 0.0,
                 batched: bool = True) -> Dict[str, float]:
        ev = COCOEvaluator("segm" if self.with_masks else "bbox")
        samples = [mapper(rec) for rec in records]
        posts: List[Dict] = [None] * len(records)
        if batched:
            # group by bucket, one lax.map dispatch per group
            groups: Dict = {}
            for i, s in enumerate(samples):
                groups.setdefault(tuple(s.bucket), []).append(i)
            for (Hb, Wb), idxs in groups.items():
                ms = self._map_step_for(Hb, Wb)
                out = ms(params,
                         jnp.asarray(np.stack(
                             [samples[i].image[None] for i in idxs])),
                         jnp.asarray(np.stack(
                             [samples[i].img_mask[None] for i in idxs])),
                         jnp.asarray(np.stack(
                             [samples[i].image_size[None] for i in idxs])),
                         jnp.asarray(np.stack(
                             [samples[i].text_ids[None] for i in idxs])),
                         jnp.asarray(np.stack(
                             [samples[i].text_mask[None] for i in idxs])))
                out = {k: np.asarray(v) for k, v in out.items()}
                for j, i in enumerate(idxs):
                    posts[i] = {k: v[j][0] for k, v in out.items()}
        else:
            for i, s in enumerate(samples):
                Hb, Wb = s.bucket
                step = self._step_for(Hb, Wb)
                post = step(params, jnp.asarray(s.image[None]),
                            jnp.asarray(s.img_mask[None]),
                            jnp.asarray(s.image_size[None]),
                            jnp.asarray(s.text_ids[None]),
                            jnp.asarray(s.text_mask[None]))
                posts[i] = {k: np.asarray(v)[0] for k, v in post.items()}
        for rec, s, post in zip(records, samples, posts):
            h, w = s.image_size
            oh, ow = rec["height"], rec["width"]
            boxes = post["boxes"] * [w, h, w, h]
            boxes = boxes * [ow / w, oh / h, ow / w, oh / h]
            keep = post["scores"] > score_thr
            pred = {"boxes": boxes[keep], "scores": post["scores"][keep],
                    "classes": post["classes"][keep]}
            if self.with_masks:
                from PIL import Image
                pm = []
                for logit in post["mask_logits"][keep]:
                    m = Image.fromarray(np.asarray(logit, np.float32))
                    m = m.resize((logit.shape[1] * 4, logit.shape[0] * 4),
                                 Image.BILINEAR)
                    m = np.asarray(m)[:h, :w]
                    m = np.asarray(Image.fromarray(m).resize((ow, oh),
                                                             Image.NEAREST))
                    pm.append(m > 0)
                pred["masks"] = pm
            gt_boxes = []
            gt_classes = []
            gt_masks = []
            for a in rec["annotations"]:
                x, y, bw, bh = a["bbox"]
                gt_boxes.append([x, y, x + bw, y + bh])
                gt_classes.append(a["category_id"])
            gt = {"boxes": np.array(gt_boxes, np.float32).reshape(-1, 4),
                  "classes": np.array(gt_classes, np.int64)}
            if self.with_masks:
                from ..data.masks import polygons_to_mask, decode_mask
                for a in rec["annotations"]:
                    seg = a.get("segmentation")
                    if isinstance(seg, dict):
                        gt_masks.append(decode_mask(seg) > 0)
                    elif seg:
                        gt_masks.append(polygons_to_mask(seg, oh, ow) > 0)
                    else:
                        gt_masks.append(np.zeros((oh, ow), bool))
                gt["masks"] = gt_masks
            ev.add(gt, pred)
        return ev.evaluate()


def evaluate_refcoco(model: UninextDETR, cfg: UninextConfig, params,
                     records: Sequence[Dict], mapper: UniDatasetMapper
                     ) -> Dict[str, float]:
    """REC evaluation: top-1 box per expression -> P@0.5 / oIoU."""
    preds, gts = [], []
    steps: Dict = {}
    for rec in records:
        s = mapper(rec)
        Hb, Wb = s.bucket
        if (Hb, Wb) not in steps:
            @jax.jit
            def step(params, image, img_mask, sizes, tids, tmask):
                out = model.apply({"params": params}, image, img_mask, sizes,
                                  tids, tmask, task="grounding", train=False)
                prob = jax.nn.sigmoid(out["pred_logits"][..., 0])
                if "pred_boxious" in out:
                    prob = jnp.sqrt(prob * jax.nn.sigmoid(
                        out["pred_boxious"][..., 0]))
                best = prob.argmax(-1)
                return jnp.take_along_axis(out["pred_boxes"],
                                           best[:, None, None], axis=1)[:, 0]
            steps[(Hb, Wb)] = step
        box = np.asarray(steps[(Hb, Wb)](
            params, jnp.asarray(s.image[None]), jnp.asarray(s.img_mask[None]),
            jnp.asarray(s.image_size[None]), jnp.asarray(s.text_ids[None]),
            jnp.asarray(s.text_mask[None])))[0]
        h, w = s.image_size
        oh, ow = rec["height"], rec["width"]
        cx, cy, bw, bh = box
        xyxy = np.array([(cx - bw / 2) * w, (cy - bh / 2) * h,
                         (cx + bw / 2) * w, (cy + bh / 2) * h])
        xyxy *= [ow / w, oh / h, ow / w, oh / h]
        preds.append(xyxy)
        a = rec["annotations"][0]
        x, y, bw, bh = a["bbox"]
        gts.append([x, y, x + bw, y + bh])
    return refcoco_metrics(np.stack(preds), np.array(gts, np.float32))


def evaluate_res(model: UninextDETR, cfg: UninextConfig, params,
                 records: Sequence[Dict], mapper: UniDatasetMapper
                 ) -> Dict[str, float]:
    """RES evaluation: the top-1 query's CondInst mask per expression ->
    mask P@0.5 / oIoU / mIoU at the annotation's original resolution
    (reference: RES branch of _derive_refcoco_results + RefCOCOeval over
    segm; mask upsampled from stride 4, thresholded at logit 0, like
    segmentation_postprocess)."""
    from PIL import Image

    from ..data.masks import decode_mask, polygons_to_mask
    from ..models.detr import feature_shapes

    inter_sum = union_sum = 0.0
    ious = []
    steps: Dict = {}
    for rec in records:
        s = mapper(rec)
        Hb, Wb = s.bucket
        if (Hb, Wb) not in steps:
            shapes = feature_shapes(cfg.transformer.num_feature_levels,
                                    Hb, Wb)

            @jax.jit
            def step(params, image, img_mask, sizes, tids, tmask,
                     shapes=shapes):
                out = model.apply({"params": params}, image, img_mask, sizes,
                                  tids, tmask, task="grounding", train=False)
                prob = jax.nn.sigmoid(out["pred_logits"][..., 0])
                if "pred_boxious" in out:
                    prob = jnp.sqrt(prob * jax.nn.sigmoid(
                        out["pred_boxious"][..., 0]))
                best = prob.argmax(-1)
                hs_sel = jnp.take_along_axis(out["hs"], best[:, None, None],
                                             axis=1)
                ref_sel = jnp.take_along_axis(out["base_reference"],
                                              best[:, None, None], axis=1)
                return model.apply({"params": params}, out["memory"], shapes,
                                   hs_sel, ref_sel, sizes,
                                   method=UninextDETR.predict_masks)[:, 0]
            steps[(Hb, Wb)] = step
        logits = np.asarray(steps[(Hb, Wb)](
            params, jnp.asarray(s.image[None]), jnp.asarray(s.img_mask[None]),
            jnp.asarray(s.image_size[None]), jnp.asarray(s.text_ids[None]),
            jnp.asarray(s.text_mask[None])))[0]          # (Hb/4, Wb/4)
        h, w = s.image_size
        oh, ow = rec["height"], rec["width"]
        content = logits[: int(np.ceil(h / 4)), : int(np.ceil(w / 4))]
        up = Image.fromarray(content.astype(np.float32)).resize(
            (ow, oh), Image.BILINEAR)
        pred = np.asarray(up) > 0
        seg = rec["annotations"][0].get("segmentation")
        if isinstance(seg, dict):
            gt = decode_mask(seg) > 0
        elif seg:
            gt = polygons_to_mask(seg, oh, ow) > 0
        else:
            gt = np.zeros((oh, ow), bool)
        inter = float(np.logical_and(pred, gt).sum())
        union = float(np.logical_or(pred, gt).sum())
        ious.append(inter / max(union, 1e-9))
        inter_sum += inter
        union_sum += union
    from ..evaluation.coco_eval import refcoco_iou_metrics
    return refcoco_iou_metrics(np.asarray(ious), inter_sum, union_sum)
