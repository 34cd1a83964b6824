import numpy as np

from uninext_tpu.evaluation.mot_eval import evaluate_mot


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
