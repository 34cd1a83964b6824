"""YouTube-VIS result formatting + offline evaluation helpers.

Parity: reference data/ytvis_eval.py:23 (YTVISEvaluator) and
instances_to_coco_json_video :216 — serializes per-video track predictions
into the YTVIS server json format:
  [{"video_id", "category_id", "score", "segmentations": [rle|null, ...]}]
so the official scorers / eval servers remain directly usable. The BDD100K
MOT/MOTS variants (:262, tools_bin converters) write the scalabel format.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def video_output_to_ytvis(video_id: int, video_output: Dict,
                          category_offset: int = 1) -> List[Dict]:
    """VISDriver output -> list of ytvis result records."""
    out = []
    for score, label, masks in zip(video_output["pred_scores"],
                                   video_output["pred_labels"],
                                   video_output["pred_masks"]):
        out.append({
            "video_id": video_id,
            "category_id": int(label) + category_offset,
            "score": float(score),
            "segmentations": [m if m is not None else None for m in masks],
        })
    return out


def save_ytvis_results(results: List[Dict], output_dir: str,
                       name: str = "results.json") -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, name)
    with open(path, "w") as f:
        json.dump(results, f)
    return path


def track_to_bdd_scalabel(video_name: str, frame_names: List[str],
                          per_frame: List[List[Dict]]) -> List[Dict]:
    """Per-frame track records -> BDD100K scalabel frames.

    per_frame[i] = [{"id", "category", "box_xyxy", ["rle"]}].
    Parity: tools_bin BDD100K MOT/MOTS converter output format."""
    frames = []
    for i, (fname, dets) in enumerate(zip(frame_names, per_frame)):
        labels = []
        for d in dets:
            rec = {
                "id": str(int(d["id"])),
                "category": d["category"],
                "box2d": {
                    "x1": float(d["box_xyxy"][0]), "y1": float(d["box_xyxy"][1]),
                    "x2": float(d["box_xyxy"][2]), "y2": float(d["box_xyxy"][3]),
                },
            }
            if "rle" in d:
                rec["rle"] = d["rle"]
            labels.append(rec)
        frames.append({"videoName": video_name, "name": fname,
                       "frameIndex": i, "labels": labels})
    return frames
