import numpy as np

from uninext_tpu.evaluation.mot_eval import evaluate_mot, pool_mot_metrics


def _frames(tracks, T):
    """tracks: {id: [(frame, box), ...]} -> per-frame dicts."""
    frames = []
    for t in range(T):
        ids, boxes = [], []
        for tid, entries in tracks.items():
            for f, b in entries:
                if f == t:
                    ids.append(tid)
                    boxes.append(b)
        frames.append({"ids": np.array(ids, np.int64),
                       "boxes": np.array(boxes, np.float32).reshape(-1, 4)})
    return frames


def test_perfect_tracking():
    box = [10, 10, 50, 50]
    gt = _frames({1: [(t, box) for t in range(5)]}, 5)
    res = evaluate_mot(gt, gt)
    assert res["MOTA"] == 1.0 and res["IDF1"] == 1.0 and res["IDS"] == 0


def test_id_switch_detected():
    box = [10, 10, 50, 50]
    gt = _frames({1: [(t, box) for t in range(6)]}, 6)
    pred = _frames({7: [(t, box) for t in range(3)],
                    8: [(t, box) for t in range(3, 6)]}, 6)
    res = evaluate_mot(gt, pred)
    assert res["IDS"] == 1
    assert res["MOTA"] == 1.0 - 1 / 6
    assert res["IDF1"] == 0.5


def test_fp_fn_counted():
    box = [10, 10, 50, 50]
    far = [200, 200, 240, 240]
    gt = _frames({1: [(t, box) for t in range(4)]}, 4)
    pred = _frames({1: [(t, box) for t in range(2)],
                    2: [(t, far) for t in range(4)]}, 4)
    res = evaluate_mot(gt, pred)
    assert res["FN"] == 2 and res["FP"] == 4


def test_pooled_metrics_weight_by_length():
    """A long perfect sequence + a short all-miss one: pooled MOTA must be
    GT-count-weighted (not the 0.5 a per-sequence mean would give)."""
    box = [10, 10, 50, 50]
    far = [200, 200, 240, 240]
    long_gt = _frames({1: [(t, box) for t in range(9)]}, 9)
    m_long = evaluate_mot(long_gt, long_gt)
    short_gt = _frames({1: [(0, box)]}, 1)
    short_pred = _frames({1: [(0, far)]}, 1)
    m_short = evaluate_mot(short_gt, short_pred)
    pooled = pool_mot_metrics([m_long, m_short])
    # 10 gt total: 1 FN + 1 FP -> MOTA = 1 - 2/10
    assert abs(pooled["MOTA"] - 0.8) < 1e-9
    assert pooled["n_gt"] == 10
    # IDF1 pooled: idtp 9; totals = (10 gt + 10 pred) -> 0.9
    assert abs(pooled["IDF1"] - 0.9) < 1e-9


def test_associate_outputs_original_pixel_boxes():
    """associate() must emit box_xyxy in ORIGINAL-image pixels: frame-step
    boxes are normalized to the content region, so the transform is
    normalized * (ow, oh) — the same net convention as
    engine/evaluator.py:81-82 (regression test for the r3 scale bug that
    made every MOT box land in [0, ow/img_w])."""
    from uninext_tpu.engine.mot_inference import associate

    emb = np.zeros((1, 8), np.float32)
    emb[0, 0] = 1.0
    raw = [{"boxes": np.array([[0.25, 0.5, 0.75, 1.0]], np.float32),
            "scores": np.array([0.9], np.float32),
            "labels": np.array([0], np.int64),
            "embeds": emb}
           for _ in range(2)]
    per_frame = associate(raw, image_size=(192, 256), ori_size=(384, 512),
                          init_score_thr=0.1, obj_score_thr=0.1)
    dets = [d for frame in per_frame for d in frame]
    assert dets, "tracker formed no track"
    np.testing.assert_allclose(
        dets[0]["box_xyxy"], [0.25 * 512, 0.5 * 384, 0.75 * 512, 1.0 * 384],
        rtol=1e-6)
