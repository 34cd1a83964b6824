"""Offline SOT / DAVIS metric sanity."""
import numpy as np

from uninext_tpu.evaluation.davis_eval import evaluate_davis, f_measure
from uninext_tpu.evaluation.sot_eval import evaluate_sot, evaluate_sot_dataset


def test_sot_perfect_tracking():
    gt = np.tile([10.0, 20.0, 50.0, 40.0], (30, 1))
    m = evaluate_sot(gt.copy(), gt)
    assert abs(m["AUC"] - (20 / 21)) < 1e-6  # iou=1 > thr for 20 of 21 thrs
    assert m["P"] == 1.0


def test_sot_degrades_with_offset():
    gt = np.tile([10.0, 20.0, 50.0, 40.0], (30, 1))
    pred = gt.copy()
    pred[:, 0] += 30  # large offset
    m = evaluate_sot(pred, gt)
    assert m["AUC"] < 0.5
    d = evaluate_sot_dataset({"a": {"pred": gt, "gt": gt},
                              "b": {"pred": pred, "gt": gt}})
    assert 0 < d["AUC"] < 1


def test_davis_perfect_and_empty():
    m = np.zeros((40, 60), bool)
    m[10:30, 15:45] = True
    masks = {1: [m.copy() for _ in range(5)]}
    res = evaluate_davis(masks, masks)
    assert abs(res["J"] - 1.0) < 1e-6
    assert abs(res["F"] - 1.0) < 1e-6
    res2 = evaluate_davis({1: [np.zeros_like(m)] * 5}, masks)
    assert res2["J"] == 0.0


def test_f_measure_tolerates_small_shift():
    m = np.zeros((100, 120), bool)
    m[20:70, 30:90] = True
    m2 = np.roll(m, 1, axis=0)
    assert f_measure(m2, m) > 0.9
    m3 = np.roll(m, 20, axis=0)
    assert f_measure(m3, m) < f_measure(m2, m)


def test_sot_submission_packaging(tmp_path):
    """GOT-10k / TrackingNet zips match the reference transform layouts
    (tools_bin/transform_got10k.py, transform_trackingnet.py)."""
    import zipfile
    from uninext_tpu.evaluation.sot_eval import save_sot_results
    from uninext_tpu.evaluation.sot_submit import (
        package_got10k_submission, package_trackingnet_submission)

    src = tmp_path / "GOT10K"
    boxes = np.array([[10.4, 20.6, 50.0, 60.0], [11.0, 21.0, 52.0, 61.0]])
    for vid in ("seq_a", "seq_b"):
        save_sot_results(str(src), vid, boxes.copy(),
                         times=np.array([0.01, 0.02]))
    # an aggregate dump the packagers must skip
    (src / "all_results.txt").write_text("junk\n")

    got_zip = package_got10k_submission(str(src))
    with zipfile.ZipFile(got_zip) as z:
        names = sorted(z.namelist())
        assert "seq_a/seq_a_001.txt" in names
        assert "seq_a/seq_a_time.txt" in names
        assert not any("all" in n for n in names)
        rows = z.read("seq_a/seq_a_001.txt").decode().strip().splitlines()
        # integer x,y,w,h (xyxy -> xywh done by save_sot_results)
        assert rows[0] == "10,21,40,39"
    assert not (tmp_path / "GOT10K_submit").exists()

    tn_zip = package_trackingnet_submission(str(src))
    with zipfile.ZipFile(tn_zip) as z:
        names = sorted(z.namelist())
        assert names == ["seq_a.txt", "seq_b.txt"]
        first = z.read("seq_b.txt").decode().strip().splitlines()[0]
        assert first == "10,21,40,39"
