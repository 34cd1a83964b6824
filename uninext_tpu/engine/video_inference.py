"""Streaming video-instance-segmentation inference (VIS/MOT drivers).

Parity anchors (reference uninext_vid.py):
  * frame loop           — :361-434 (per-frame full model pass, prompt
                           features cached per video)
  * inference_vis        — :1359-1469 (select thr -> class-aware NMS(0.9) ->
                           IDOL tracker match -> per-id mask RLE memory)
  * post_process_vis     — :1471-1533 (temporal mean/max, multi-class thr)
  * inference_mot        — :1199 (QDTrack path, boxes only)

TPU design: the per-frame model pass + candidate selection is ONE jitted
function with static shapes (fixed top-K candidates); only the tiny tracker
state machine and RLE encoding live on host. Masks come back at stride 4 and
are upsampled/resized on host (numpy) to the original size.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UninextConfig
from ..data import masks as mask_util
from ..models.detr import UninextDETR, feature_shapes
from ..models.postprocess import grounding_to_od_logits
from ..models.trackers import IDOLTracker, QuasiDenseTracker
from ..ops.nms import batched_nms
from ..utils import box_ops

TOPK_VIS = 50


def make_vis_frame_step(model: UninextDETR, cfg: UninextConfig,
                        cls_token_map: jnp.ndarray, H: int, W: int,
                        select_thr: float = 0.1, nms_thr: float = 0.9):
    """One jitted step: frame -> top-K candidates (+ masks + embeds)."""
    shapes = feature_shapes(cfg.transformer.num_feature_levels, H, W)

    @jax.jit
    def step(params, image, img_mask, sizes, text_ids, text_mask):
        out = model.apply({"params": params}, image, img_mask, sizes,
                          text_ids, text_mask, task="detection", train=False)
        logits = grounding_to_od_logits(out["pred_logits"], cls_token_map)
        prob = jax.nn.sigmoid(logits)                        # (1, Q, C)
        if "pred_boxious" in out:
            prob = jnp.sqrt(prob * jax.nn.sigmoid(
                out["pred_boxious"].astype(jnp.float32)))
        max_score = prob.max(-1)[0]                          # (Q,)
        cls = prob.argmax(-1)[0]
        boxes_xyxy = box_ops.box_cxcywh_to_xyxy(out["pred_boxes"][0])
        selected = max_score > select_thr
        # guarantee >= 1 candidate (reference takes top-1 when none selected)
        selected = selected | (jnp.arange(len(max_score)) == max_score.argmax())
        keep = batched_nms(boxes_xyxy, max_score, cls, nms_thr, valid=selected)
        score_for_topk = jnp.where(keep, max_score, -1.0)
        top_scores, top_q = jax.lax.top_k(score_for_topk, TOPK_VIS)
        valid = top_scores > 0

        sel_hs = jnp.take_along_axis(out["hs"], top_q[None, :, None], axis=1)
        sel_ref = jnp.take_along_axis(out["base_reference"],
                                      top_q[None, :, None], axis=1)
        masks = model.apply({"params": params}, out["memory"], shapes,
                            sel_hs, sel_ref, sizes,
                            method=UninextDETR.predict_masks)  # (1,K,h,w)
        # full reid path (deformable reid decoder when configured) comes
        # precomputed for all queries in the forward (inference_outputs)
        embeds = jnp.take_along_axis(out["pred_embeds"],
                                     top_q[None, :, None], axis=1)
        return {
            "query_idx": top_q, "valid": valid,
            "scores_full": jnp.take_along_axis(
                prob[0], top_q[:, None], axis=0),             # (K, C)
            "boxes": jnp.take_along_axis(boxes_xyxy, top_q[:, None], axis=0),
            "boxes_cxcywh": jnp.take_along_axis(
                out["pred_boxes"][0], top_q[:, None], axis=0),
            "labels": jnp.take_along_axis(cls, top_q, axis=0),
            "max_scores": jnp.take_along_axis(max_score, top_q, axis=0),
            "mask_logits": masks[0],
            "embeds": embeds[0],
        }

    return step


def _mask_to_original(mask_logit: np.ndarray, image_size, ori_size
                      ) -> np.ndarray:
    """stride-4 logits -> binary mask at original resolution (host)."""
    from PIL import Image
    h, w = image_size
    oh, ow = ori_size
    m = Image.fromarray(np.asarray(mask_logit, np.float32))
    m = m.resize((mask_logit.shape[1] * 4, mask_logit.shape[0] * 4),
                 Image.BILINEAR)
    m = np.asarray(m)[:h, :w]
    m = np.asarray(Image.fromarray(m).resize((ow, oh), Image.NEAREST))
    return m > 0


class VISDriver:
    """Per-video streaming driver with IDOL tracking + RLE memory."""

    def __init__(self, model, params, cfg: UninextConfig, cls_token_map,
                 H: int, W: int):
        self.cfg = cfg
        self.params = params
        self.step = make_vis_frame_step(
            model, cfg, cls_token_map, H, W,
            select_thr=cfg.track.inference_select_thr)

    def run_video(self, frames, img_masks, sizes, text_ids, text_mask,
                  ori_size) -> Dict:
        """frames: list of (1,H,W,3); returns post-processed video output."""
        tr = self.cfg.track
        tracker = IDOLTracker(
            init_score_thr=tr.idol_init_score_thr,
            addnew_score_thr=tr.idol_addnew_score_thr,
            obj_score_thr=tr.idol_obj_score_thr,
            match_score_thr=tr.idol_match_score_thr,
            memory_len=tr.memory_len,
            frame_weight=tr.frame_weight,
            temporal_weight=tr.temporal_weight)
        video_dict: Dict[int, Dict] = {}
        n_frames = len(frames)
        image_size = (int(sizes[0, 0]), int(sizes[0, 1]))
        for fi in range(n_frames):
            o = self.step(self.params, frames[fi], img_masks, sizes,
                          text_ids, text_mask)
            o = {k: np.asarray(v) for k, v in o.items()}
            v = o["valid"]
            keep_idx, ids = tracker.match(
                o["boxes"][v], o["max_scores"][v], o["labels"][v],
                o["mask_logits"][v], o["embeds"][v], fi)
            sel = np.flatnonzero(v)[keep_idx]
            for local_i, (si, tid) in enumerate(zip(sel, ids)):
                if tid < 0:
                    continue
                mask = _mask_to_original(o["mask_logits"][si], image_size,
                                         ori_size)
                rle = mask_util.encode_mask(mask.astype(np.uint8))
                if tid not in video_dict:
                    video_dict[tid] = {"masks": [None] * fi,
                                       "scores": [None] * fi, "valid": 0}
                video_dict[tid]["masks"].append(rle)
                video_dict[tid]["scores"].append(o["scores_full"][si])
                video_dict[tid]["valid"] += 1
            for tid, rec in video_dict.items():
                if len(rec["masks"]) < fi + 1:
                    rec["masks"].append(None)
                    rec["scores"].append(None)
            # prune short noise tracks (reference :1457-1464)
            if fi > 8:
                dead = [tid for tid, rec in video_dict.items()
                        if rec["masks"][-1] is None
                        and rec["masks"][-2] is None and rec["valid"] < 3]
                for tid in dead:
                    video_dict.pop(tid)
        return self.post_process(video_dict, n_frames, ori_size)

    def post_process(self, video_dict, vid_len, ori_size) -> Dict:
        tr = self.cfg.track
        out_scores, out_labels, out_masks = [], [], []
        for tid, rec in video_dict.items():
            sc = np.stack([s for s in rec["scores"] if s is not None])
            agg = sc.mean(0) if tr.temporal_score_type == "mean" else sc.max(0)
            if tr.multi_cls_on:
                for c in np.flatnonzero(agg > tr.apply_cls_thr):
                    out_scores.append(float(agg[c]))
                    out_labels.append(int(c))
                    out_masks.append(rec["masks"])
            else:
                out_scores.append(float(agg.max()))
                out_labels.append(int(agg.argmax()))
                out_masks.append(rec["masks"])
        return {"image_size": ori_size, "pred_scores": out_scores,
                "pred_labels": out_labels, "pred_masks": out_masks}
