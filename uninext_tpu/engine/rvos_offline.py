"""Ref-DAVIS offline R-VOS: per-expression probability aggregation.

Parity: reference inference_rvos_offline (uninext_vid.py:551-670) — for
Ref-DAVIS each target object has multiple annotated expressions; the
reference runs one pass per (object, expression), averages mask
probabilities across expressions per object, then soft-aggregates objects
per frame (same merge as VOS, uninext_vid.py:774-794).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from .sot_inference import soft_aggregate


def aggregate_expressions(prob_maps_per_expr: List[np.ndarray]) -> np.ndarray:
    """Mean over expressions: list of (T, H, W) -> (T, H, W)."""
    return np.mean(np.stack(prob_maps_per_expr), axis=0)


def merge_objects_per_frame(per_object_probs: Dict[int, np.ndarray]
                            ) -> List[np.ndarray]:
    """{obj_id: (T, H, W) probs} -> per-frame (H, W) uint8 label maps with
    the original object ids."""
    oids = sorted(per_object_probs)
    T = per_object_probs[oids[0]].shape[0]
    remap = np.zeros(len(oids) + 1, np.uint8)
    for i, oid in enumerate(oids):
        remap[i + 1] = oid
    out = []
    for t in range(T):
        stacked = np.stack([per_object_probs[o][t] for o in oids])
        out.append(remap[soft_aggregate(stacked)])
    return out


def run_refdavis_offline(rvos_driver, frames, img_masks, sizes,
                         expressions_per_object: Dict[int, List[tuple]],
                         ori_size) -> List[np.ndarray]:
    """expressions_per_object: {obj_id: [(lang_hidden, lang_mask), ...]}.

    Runs the per-frame grounding pass once per (object, expression), then
    aggregates. rvos_driver: RVOSDriver (engine/mot_inference.py)."""
    import jax
    import jax.numpy as jnp
    per_object = {}
    image_size = (int(sizes[0, 0]), int(sizes[0, 1]))
    d_model = rvos_driver.cfg.transformer.d_model
    for oid, exprs in expressions_per_object.items():
        probs_per_expr = []
        for (lh, lm) in exprs:
            frames_probs = []
            # temporal consistency state (round 5): per (object, expression)
            # pass — the selected-query embedding chains across frames
            prev_embed = jnp.zeros((1, d_model))
            has_prev = jnp.zeros((), bool)
            for fi in range(len(frames)):
                r = rvos_driver.step(rvos_driver.params, frames[fi],
                                     img_masks, sizes, lh, lm,
                                     prev_embed, has_prev)
                prev_embed = r["embed"]
                has_prev = jnp.ones((), bool)
                from .video_inference import _mask_to_original
                logit = np.asarray(r["mask_logits"][0], np.float32)
                # keep probabilities (not thresholded) for aggregation
                from PIL import Image
                m = Image.fromarray(logit)
                m = m.resize((logit.shape[1] * 4, logit.shape[0] * 4),
                             Image.BILINEAR)
                m = np.asarray(m)[:image_size[0], :image_size[1]]
                m = np.asarray(Image.fromarray(m).resize(
                    (ori_size[1], ori_size[0]), Image.NEAREST))
                frames_probs.append(1.0 / (1.0 + np.exp(-m)))
            probs_per_expr.append(np.stack(frames_probs))
        per_object[oid] = aggregate_expressions(probs_per_expr)
    return merge_objects_per_frame(per_object)
