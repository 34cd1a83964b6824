"""Offline YouTube-VIS track mAP (evaluation/ytvis_eval.evaluate_ytvis):
hand-built videos where the correct AP is known."""
import numpy as np

from uninext_tpu.data.masks import encode_mask
from uninext_tpu.evaluation.ytvis_eval import evaluate_ytvis


def _gt(h=32, w=48, T=3):
    def seg_rect(x0, y0, x1, y1):
        m = np.zeros((h, w), bool)
        m[y0:y1, x0:x1] = True
        return encode_mask(m)

    videos = [{"id": 1, "height": h, "width": w, "length": T,
               "file_names": [f"{i}.jpg" for i in range(T)]}]
    annotations = [
        {"id": 1, "video_id": 1, "category_id": 1,
         "segmentations": [seg_rect(4, 4, 16, 16)] * T},
        {"id": 2, "video_id": 1, "category_id": 2,
         "segmentations": [seg_rect(28, 10, 44, 26)] * T},
    ]
    return {"videos": videos, "annotations": annotations,
            "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}


def _pred_from(gt, scores=(0.9, 0.8)):
    out = []
    for a, s in zip(gt["annotations"], scores):
        out.append({"video_id": a["video_id"],
                    "category_id": a["category_id"], "score": s,
                    "segmentations": list(a["segmentations"])})
    return out


def test_perfect_predictions_ap1():
    gt = _gt()
    res = evaluate_ytvis(_pred_from(gt), gt)
    assert abs(res["AP"] - 1.0) < 1e-6
    assert abs(res["AP50"] - 1.0) < 1e-6


def test_wrong_category_scores_zero():
    gt = _gt()
    pred = _pred_from(gt)
    for p in pred:
        p["category_id"] = 3 - p["category_id"]     # swap classes
    res = evaluate_ytvis(pred, gt)
    assert res["AP"] < 1e-6


def test_temporal_miss_lowers_iou():
    """A track that disappears for 2 of 3 frames has spatio-temporal IoU
    1/3 (sum of intersections / sum of unions) -> below every threshold."""
    gt = _gt()
    pred = _pred_from(gt)
    pred[0]["segmentations"][1] = None
    pred[0]["segmentations"][2] = None
    res = evaluate_ytvis(pred, gt)
    # track 0 unmatched at all thresholds, track 1 perfect -> mAP 0.5
    assert abs(res["AP"] - 0.5) < 1e-6


def test_half_overlap_matches_only_low_thresholds():
    """Predicted box shifted to overlap IoU ~ 1/3: matched at no threshold
    >= 0.5 -> that class contributes 0."""
    h, w, T = 32, 48, 3
    gt = _gt(h, w, T)

    def seg_rect(x0, y0, x1, y1):
        m = np.zeros((h, w), bool)
        m[y0:y1, x0:x1] = True
        return encode_mask(m)

    pred = _pred_from(gt)
    pred[0]["segmentations"] = [seg_rect(10, 4, 22, 16)] * T  # x-shift 6/12
    res = evaluate_ytvis(pred, gt)
    assert abs(res["AP"] - 0.5) < 1e-6     # 0 for class a, 1 for class b
    # IoU = 6/18 = 0.333 < 0.5 -> also zero at AP50
    assert abs(res["AP50"] - 0.5) < 1e-6
