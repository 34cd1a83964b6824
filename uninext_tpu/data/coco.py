"""COCO-format dataset loading + the unified detection/grounding mapper.

Parity anchors:
  * dataset dicts      — detectron2 load_coco_json semantics (file_name,
                         annotations with bbox XYWH, category_id, segmentation)
  * DetrDatasetMapperUni — data/coco_dataset_mapper_uni.py:103-315 (resize
                         shortest edge to a sampled bucket, random flip with
                         left/right swap in expressions, prompt construction,
                         positive maps, static padding)
  * RefCOCO loading    — data/datasets/refcoco.py:45 (one expression per dict)

TPU-first differences: every sample is padded to a static (bucket_h, bucket_w,
max_insts, max_text_len) so each (task, bucket) pair compiles exactly once.
Masks are rasterized at stride `mask_out_stride` directly (criterion contract)
using the reference's offset convention (start = stride // 2).
"""
from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..config import DataConfig
from . import masks as mask_util
from .prompts import (build_detection_prompt, sample_classes_for_training,
                      tokenize_with_positive_map)
from .tokenizer import BertTokenizer


def load_coco_json(json_file: str, image_root: str,
                   filter_empty: bool = True) -> Tuple[List[Dict], List[str]]:
    """Minimal COCO json -> dataset dicts + category names (contiguous ids)."""
    with open(json_file) as f:
        coco = json.load(f)
    cats = sorted(coco["categories"], key=lambda c: c["id"])
    cat_names = [c["name"] for c in cats]
    id_map = {c["id"]: i for i, c in enumerate(cats)}
    anns_by_img: Dict[int, List[Dict]] = {}
    for a in coco.get("annotations", []):
        anns_by_img.setdefault(a["image_id"], []).append(a)
    out = []
    for img in coco["images"]:
        anns = anns_by_img.get(img["id"], [])
        annos = []
        for a in anns:
            if a.get("iscrowd", 0):
                continue
            annos.append({
                "bbox": a["bbox"],                       # XYWH abs
                "category_id": id_map[a["category_id"]],
                "segmentation": a.get("segmentation"),
            })
        if filter_empty and not annos:
            continue
        out.append({
            "file_name": os.path.join(image_root, img["file_name"]),
            "image_id": img["id"],
            "height": img["height"], "width": img["width"],
            "annotations": annos,
            "dataset": "coco",
            "task": "detection",
        })
    return out, cat_names


def load_refcoco_json(json_file: str, image_root: str) -> List[Dict]:
    """RefCOCO-style json (d2-converted format): one record per expression."""
    with open(json_file) as f:
        data = json.load(f)
    out = []
    for d in data:
        out.append({
            "file_name": os.path.join(image_root, d["file_name"]),
            "image_id": d["image_id"],
            "height": d["height"], "width": d["width"],
            "annotations": d["annotations"],
            "expressions": d["expressions"],
            "dataset": "refcoco",
            "task": "grounding",
        })
    return out


def resize_shortest_edge(h: int, w: int, short: int, max_size: int
                         ) -> Tuple[int, int]:
    scale = short / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    return int(round(h * scale)), int(round(w * scale))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class MappedSample:
    """One padded, model-ready sample (all numpy, static shapes)."""
    image: np.ndarray          # (Hb, Wb, 3) float32, normalized
    img_mask: np.ndarray       # (Hb, Wb) bool, True = padding
    image_size: np.ndarray     # (2,) int32 valid (h, w)
    text_ids: np.ndarray       # (T,) int32
    text_mask: np.ndarray      # (T,) int32
    boxes: np.ndarray          # (G, 4) cxcywh normalized
    valid: np.ndarray          # (G,) bool
    positive_map: np.ndarray   # (G, T) bool
    masks: Optional[np.ndarray]  # (G, Hb/4, Wb/4) float32 or None
    labels: np.ndarray         # (G,) int32 contiguous category (or 0)
    bucket: Tuple[int, int]    # padded (Hb, Wb) — batching key


class UniDatasetMapper:
    """Detection + grounding train/eval mapper with static-shape outputs."""

    def __init__(self, cfg: DataConfig, categories: Sequence[str],
                 tokenizer: Optional[BertTokenizer] = None,
                 is_train: bool = True, with_masks: bool = True,
                 max_classes_per_prompt: int = 80,
                 lsj: bool = False, lsj_size: int = 1024,
                 lsj_min_scale: float = 0.1, lsj_max_scale: float = 2.0):
        self.cfg = cfg
        self.categories = list(categories)
        self.tok = tokenizer or BertTokenizer()
        self.is_train = is_train
        self.with_masks = with_masks
        self.max_classes = max_classes_per_prompt
        # large-scale jitter (INPUT.DATASET_MAPPER_NAME=coco_instance_lsj):
        # random scale into a fixed square canvas (single compile bucket)
        self.lsj = lsj
        self.lsj_size = lsj_size
        self.lsj_scale = (lsj_min_scale, lsj_max_scale)

    # -- geometry ------------------------------------------------------
    def _load_and_resize(self, record: Dict, rng: random.Random):
        img = Image.open(record["file_name"]).convert("RGB")
        w0, h0 = img.size
        if self.lsj and self.is_train:
            scale = rng.uniform(*self.lsj_scale)
            s = min(self.lsj_size / h0, self.lsj_size / w0) * scale
            h = min(int(round(h0 * s)), self.lsj_size)
            w = min(int(round(w0 * s)), self.lsj_size)
        elif self.is_train:
            short = rng.choice(self.cfg.min_size_train)
            max_size = self.cfg.max_size_train
            h, w = resize_shortest_edge(h0, w0, short, max_size)
        else:
            short = self.cfg.min_size_test
            max_size = self.cfg.max_size_test
            h, w = resize_shortest_edge(h0, w0, short, max_size)
        img = img.resize((w, h), Image.BILINEAR)
        flip = self.is_train and rng.random() < 0.5
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        arr = np.asarray(img, np.float32)
        arr = (arr - np.array(self.cfg.pixel_mean)) / np.array(self.cfg.pixel_std)
        return arr.astype(np.float32), (h0, w0), (h, w), flip

    def _bucket(self, h: int, w: int) -> Tuple[int, int]:
        if self.lsj and self.is_train:
            return self.lsj_size, self.lsj_size
        d = self.cfg.size_divisibility
        return round_up(h, d), round_up(w, d)

    # -- main ----------------------------------------------------------
    def __call__(self, record: Dict, rng: Optional[random.Random] = None
                 ) -> MappedSample:
        rng = rng or random.Random()
        task = record.get("task", "detection")
        image, (h0, w0), (h, w), flip = self._load_and_resize(record, rng)
        G = self.cfg.max_insts
        T = self.cfg.max_text_len
        sx, sy = w / w0, h / h0

        annos = record.get("annotations", [])[:G]
        boxes = np.zeros((G, 4), np.float32)
        valid = np.zeros((G,), bool)
        labels = np.zeros((G,), np.int32)
        polys = []
        for i, a in enumerate(annos):
            x, y, bw, bh = a["bbox"]
            x0, y0, x1, y1 = x * sx, y * sy, (x + bw) * sx, (y + bh) * sy
            if flip:
                x0, x1 = w - x1, w - x0
            cx, cy = (x0 + x1) / 2 / w, (y0 + y1) / 2 / h
            boxes[i] = (cx, cy, (x1 - x0) / w, (y1 - y0) / h)
            valid[i] = True
            labels[i] = a.get("category_id", 0)
            polys.append(a.get("segmentation"))

        # prompt + positive map
        if task == "grounding":
            expr = record["expressions"]
            if isinstance(expr, list):
                expr = rng.choice(expr) if self.is_train else expr[0]
            if flip:
                expr = expr.replace("left", "@").replace(
                    "right", "left").replace("@", "right")
            tok = self.tok(expr, max_length=T)
            text_ids, text_mask = tok["input_ids"], tok["attention_mask"]
            pm = np.zeros((G, T), bool)
            pm[valid, 0] = True          # single pooled-token target
        else:
            pos_labels = labels[valid].tolist()
            if self.is_train:
                keep = sample_classes_for_training(
                    pos_labels, len(self.categories), rng, self.max_classes)
            else:
                keep = list(range(len(self.categories)))
            text, spans = build_detection_prompt(
                [self.categories[c] for c in keep])
            label_to_slot = {c: i for i, c in enumerate(keep)}
            spans_per_obj = [[spans[label_to_slot[int(l)]]]
                             for l in labels[valid]]
            text_ids, text_mask, pm_valid = tokenize_with_positive_map(
                text, spans_per_obj, self.tok, T)
            pm = np.zeros((G, T), bool)
            pm[:pm_valid.shape[0]] = pm_valid

        # pad image to bucket
        Hb, Wb = self._bucket(h, w)
        padded = np.zeros((Hb, Wb, 3), np.float32)
        padded[:h, :w] = image
        img_mask = np.ones((Hb, Wb), bool)
        img_mask[:h, :w] = False

        gt_masks = None
        if self.with_masks:
            s = self.cfg.size_divisibility // 8  # mask_out_stride = 4
            stride = 4
            mh, mw = Hb // stride, Wb // stride
            gt_masks = np.zeros((G, mh, mw), np.float32)
            for i, seg in enumerate(polys):
                if seg is None:
                    continue
                if isinstance(seg, dict):
                    m = mask_util.decode_mask(seg)
                    m = np.asarray(Image.fromarray(m * 255).resize(
                        (w, h), Image.BILINEAR)) > 127
                else:
                    scaled = [np.asarray(p, np.float64).reshape(-1, 2)
                              * [sx, sy] for p in seg if len(p) >= 6]
                    if flip:
                        scaled = [np.stack([w - p[:, 0], p[:, 1]], 1)
                                  for p in scaled]
                    m = mask_util.polygons_to_mask(
                        [p.ravel().tolist() for p in scaled], h, w)
                full = np.zeros((Hb, Wb), np.uint8)
                full[:h, :w] = m
                # stride-4 sampling with the reference's start offset
                gt_masks[i] = full[stride // 2::stride, stride // 2::stride]

        return MappedSample(
            image=padded, img_mask=img_mask,
            image_size=np.array([h, w], np.int32),
            text_ids=text_ids.astype(np.int32),
            text_mask=text_mask.astype(np.int32),
            boxes=boxes, valid=valid, positive_map=pm,
            masks=gt_masks, labels=labels, bucket=(Hb, Wb))
