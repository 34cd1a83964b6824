"""Evaluator sanity: perfect predictions -> AP=1; C++ core == python core."""
import numpy as np

from uninext_tpu.evaluation import fast_eval
from uninext_tpu.evaluation.coco_eval import (COCOEvaluator, IOU_THRS,
                                              refcoco_metrics)


def _boxes(n, rng, size=400):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * 80 + 20
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_perfect_predictions_ap1():
    rng = np.random.RandomState(0)
    ev = COCOEvaluator()
    for img in range(4):
        b = _boxes(6, rng)
        cls = rng.randint(0, 3, 6)
        ev.add({"boxes": b, "classes": cls},
               {"boxes": b, "classes": cls,
                "scores": rng.rand(6).astype(np.float32) * 0.5 + 0.5})
    res = ev.evaluate()
    assert abs(res["AP"] - 1.0) < 1e-6, res
    assert abs(res["AP50"] - 1.0) < 1e-6


def test_missed_and_false_positives_reduce_ap():
    rng = np.random.RandomState(1)
    ev = COCOEvaluator()
    b = _boxes(4, rng)
    cls = np.zeros(4, np.int64)
    # predict only 2 of 4 + 2 false positives far away
    pred_b = np.concatenate([b[:2], b[2:] + 1000])
    ev.add({"boxes": b, "classes": cls},
           {"boxes": pred_b, "classes": cls,
            "scores": np.array([0.9, 0.8, 0.7, 0.6], np.float32)})
    res = ev.evaluate()
    assert 0.0 < res["AP50"] < 1.0


def test_cpp_matches_python_core():
    rng = np.random.RandomState(2)
    n_det, n_gt = 20, 7
    ious = rng.rand(n_det, n_gt).astype(np.float32)
    gt_ig = np.array([0, 0, 0, 0, 0, 1, 1], np.uint8)  # ignored-last
    det_ig = rng.randint(0, 2, n_det).astype(np.uint8)
    thrs = IOU_THRS
    lib = fast_eval._build_and_load()
    assert lib is not None, "C++ cocoeval core failed to build"
    m_cpp, i_cpp = fast_eval.coco_match(ious, gt_ig, thrs, det_ig)
    # force python fallback
    fast_eval._LIB, fast_eval._TRIED = None, True
    try:
        m_py, i_py = fast_eval.coco_match(ious, gt_ig, thrs, det_ig)
    finally:
        fast_eval._TRIED = False
        fast_eval._LIB = None
    np.testing.assert_array_equal(m_cpp, m_py)
    np.testing.assert_array_equal(i_cpp, i_py)


def test_refcoco_metrics():
    gt = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], np.float32)
    pred = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    m = refcoco_metrics(pred, gt)
    assert abs(m["P@0.5"] - 0.5) < 1e-6
    assert 0 < m["oIoU"] < 1


def test_refcoco_precision_sweep():
    """Hand-computed fixture for the full P@{0.5..0.9} sweep (reference
    coco_evaluation.py:440-445: strict > threshold on per-expression IoU).

    Three expressions with per-pair IoUs 1.0 / 0.9 / 0.0 (derivations
    inline below)."""
    gt = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [0, 0, 10, 10]],
                  np.float32)
    # IoUs: exact match = 1.0; [0,0,9,10] -> inter 90, union 100 -> 0.9;
    # disjoint -> 0.0
    pred = np.array([[0, 0, 10, 10], [0, 0, 9, 10], [50, 50, 60, 60]],
                    np.float32)
    m = refcoco_metrics(pred, gt)
    # iou list = [1.0, 0.9, 0.0]: P@0.5..0.8 = 2/3, P@0.9 = 1/3 (strict >)
    for t in (0.5, 0.6, 0.7, 0.8):
        assert abs(m[f"P@{t}"] - 2 / 3) < 1e-6, (t, m)
    assert abs(m["P@0.9"] - 1 / 3) < 1e-6
    assert abs(m["mIoU"] - (1.0 + 0.9 + 0.0) / 3) < 1e-6
    # oIoU pooled = sum(inter) / sum(area_p + area_g - inter)
    #             = (100+90+0) / (100 + 100 + 200) = 190/400
    assert abs(m["oIoU"] - 190 / 400) < 1e-6

    from uninext_tpu.evaluation.coco_eval import refcoco_iou_metrics
    mm = refcoco_iou_metrics(np.array([1.0, 0.9, 0.0]), 190.0, 400.0)
    for k in m:
        assert abs(mm[k] - m[k]) < 1e-6, (k, mm[k], m[k])
