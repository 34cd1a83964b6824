"""CLI tools work end-to-end on the tiny config: demo.py draws detections,
vot_integration.py tracks through the initialize/track protocol (reference
demo.py / vot_tool.py)."""
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def jpeg(tmp_path_factory):
    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    p = tmp_path_factory.mktemp("demo") / "img.jpg"
    Image.fromarray(img).save(p)
    return str(p)


def test_demo_detection(jpeg, tmp_path, monkeypatch):
    import demo
    out = str(tmp_path / "out.png")
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--image", jpeg, "--config", "tiny_test_config",
        "--output", out, "--score-thr", "0.0"])
    demo.main()
    assert os.path.exists(out)
    assert Image.open(out).size[0] > 0


def test_demo_grounding(jpeg, tmp_path, monkeypatch):
    import demo
    out = str(tmp_path / "out_g.png")
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--image", jpeg, "--config", "tiny_test_config",
        "--prompt", "the red thing on the left", "--output", out,
        "--score-thr", "0.0"])
    demo.main()
    assert os.path.exists(out)


def test_vot_tracker_protocol():
    from vot_integration import UninextVOTTracker
    rng = np.random.RandomState(1)
    frames = [(rng.rand(96, 128, 3) * 255).astype(np.uint8)
              for _ in range(3)]
    tr = UninextVOTTracker(config_name="tiny_test_config")
    tr.initialize(frames[0], [30.0, 20.0, 40.0, 30.0])
    for f in frames[1:]:
        box, conf = tr.track(f)
        assert len(box) == 4 and np.isfinite(box).all()
        assert box[2] > 0 and box[3] > 0
        assert 0.0 <= conf <= 1.0


def test_train_net_eval_only(tmp_path, monkeypatch, capsys):
    """train_net.py --eval-only runs the detection evaluator end-to-end
    (reference train_net.py --eval-only path)."""
    import json

    from uninext_tpu.data.mini_coco import make_mini_coco
    paths = make_mini_coco(str(tmp_path / "mc"), seed=3)
    import train_net
    monkeypatch.setattr(sys, "argv", [
        "train_net.py", "--config", "tiny_test_config", "--eval-only",
        "--coco-json", paths["val_json"], "--image-root", paths["val_root"],
        "--output-dir", str(tmp_path / "out")])
    train_net.main()
    out = capsys.readouterr().out.strip().splitlines()
    res = json.loads("\n".join(out[out.index("{"):])) if "{" in out else \
        json.loads("\n".join(out))
    assert "AP" in res


def test_eval_video_vos_cli(tmp_path, monkeypatch, capsys):
    """eval_video.py --task vos walks a DAVIS-layout directory, writes
    palette PNGs and prints J&F (reference eval-vid workflow)."""
    from uninext_tpu.evaluation.davis_eval import davis_palette
    root = tmp_path / "DAVIS"
    vdir = root / "JPEGImages" / "480p" / "toyvid"
    adir = root / "Annotations" / "480p" / "toyvid"
    vdir.mkdir(parents=True)
    adir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    for fi in range(3):
        arr = (rng.rand(72, 104, 3) * 255).astype(np.uint8)
        arr[10:34, 12:42] = (200, 30, 30)
        Image.fromarray(arr).save(vdir / f"{fi:05d}.jpg")
    ann = np.zeros((72, 104), np.uint8)
    ann[10:34, 12:42] = 1
    pimg = Image.fromarray(ann, mode="P")
    pimg.putpalette(davis_palette().ravel().tolist())
    pimg.save(adir / "00000.png")

    import eval_video
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "eval_video.py", "--task", "vos", "--data-root", str(root),
        "--config", "tiny_test_config", "--bucket", "96", "128",
        "--output-dir", str(out)])
    eval_video.main()
    txt = capsys.readouterr().out
    assert "J&F" in txt
    pngs = list((out / "toyvid").glob("*.png"))
    assert len(pngs) == 3
    assert Image.open(pngs[0]).mode == "P"


def test_analyze_sot_results(tmp_path, monkeypatch, capsys):
    """tools/analyze_sot_results.py (tools_bin/analysis_results.py parity):
    reads <vid>.txt result files vs a LaSOT layout and prints AUC/P."""
    import numpy as np
    # LaSOT layout with 1 sequence, 4 frames
    seq = tmp_path / "data" / "toy" / "toy-1"
    (seq / "img").mkdir(parents=True)
    gts = []
    for fi in range(4):
        gts.append(f"{20 + 2 * fi},24,30,28")
    (seq / "groundtruth.txt").write_text("\n".join(gts) + "\n")
    (seq / "full_occlusion.txt").write_text("0,0,0,0\n")
    (seq / "out_of_view.txt").write_text("0,0,0,0\n")
    # perfect tracker + a bad tracker
    good = tmp_path / "good"
    bad = tmp_path / "bad"
    good.mkdir(), bad.mkdir()
    pred = np.array([[20 + 2 * fi, 24, 30, 28] for fi in range(4)], float)
    np.savetxt(good / "toy-1.txt", pred, fmt="%.2f", delimiter=",")
    np.savetxt(good / "toy-1_time.txt", np.full(4, 0.02), fmt="%.6f")
    np.savetxt(bad / "toy-1.txt", pred + [60, 60, 0, 0], fmt="%.2f",
               delimiter=",")
    import analyze_sot_results
    monkeypatch.setattr(sys, "argv", [
        "analyze_sot_results.py", "--results", str(good), str(bad),
        "--data-root", str(tmp_path / "data")])
    analyze_sot_results.main()
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith(("good", "bad"))]
    assert len(lines) == 2
    auc_good = float(lines[0].split()[2])
    auc_bad = float(lines[1].split()[2])
    assert auc_good > 0.95 and auc_bad < 0.2
    assert "20.0" in lines[0]                      # ms/frame from time files


def test_demo_video_frames_and_sot(tmp_path, monkeypatch):
    """demo.py --frames: per-frame detection over a directory, and SOT
    tracking with --init-box (the reference demo's --video-input mode)."""
    import demo
    rng = np.random.RandomState(3)
    fdir = tmp_path / "frames"
    fdir.mkdir()
    for i in range(3):
        arr = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
        arr[30:60, 40 + 6 * i:70 + 6 * i] = (220, 40, 40)
        Image.fromarray(arr).save(fdir / f"{i:03d}.jpg")
    out_det = tmp_path / "out_det"
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--frames", str(fdir), "--config", "tiny_test_config",
        "--output", str(out_det), "--score-thr", "0.0"])
    demo.main()
    assert len(os.listdir(out_det)) == 3

    out_sot = tmp_path / "out_sot"
    monkeypatch.setattr(sys, "argv", [
        "demo.py", "--frames", str(fdir), "--config", "tiny_test_config",
        "--init-box", "40", "30", "70", "60", "--output", str(out_sot)])
    demo.main()
    assert len(os.listdir(out_sot)) == 3


def test_eval_video_rvos_cli(tmp_path, monkeypatch, capsys):
    """eval_video.py --task rvos streams (video, expression) pairs, writes
    the Ref-YTVOS submission layout Annotations/<vid>/<exp_idx>/<frame>.png
    and prints per-expression + mean J&F (reference inference_rvos,
    uninext_vid.py:1293)."""
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    paths = make_mini_ytvis(str(tmp_path / "rv"), n_train=1, n_val=1,
                            referring=True, max_objects=2, seed=9,
                            size=(96, 128), length=3)

    import eval_video
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "eval_video.py", "--task", "rvos",
        "--data-root", paths["val_root"], "--json", paths["val_json"],
        "--config", "tiny_test_config", "--bucket", "96", "128",
        "--output-dir", str(out)])
    eval_video.main()
    txt = capsys.readouterr().out
    assert "mean J&F" in txt
    vids = list((out / "Annotations").iterdir())
    assert len(vids) == 1
    pngs = list((vids[0] / "0").glob("*.png"))
    assert len(pngs) == 3
    assert Image.open(pngs[0]).mode == "P"


def test_eval_video_mots_cli(tmp_path, monkeypatch, capsys):
    """eval_video.py --task mots runs the masked QDTrack path and writes the
    BDD seg_track submission (RGBA bitmask PNG per frame + box_track json)
    — reference bdd_seg_track eval-vid config."""
    root = tmp_path / "frames"
    vdir = root / "vid0"
    vdir.mkdir(parents=True)
    rng = np.random.RandomState(5)
    for fi in range(3):
        arr = (rng.rand(72, 104, 3) * 255).astype(np.uint8)
        arr[20 + fi:44 + fi, 12:42] = (30, 160, 220)
        Image.fromarray(arr).save(vdir / f"{fi:05d}.jpg")

    import eval_video
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "eval_video.py", "--task", "mots", "--data-root", str(root),
        "--config", "tiny_video_test_config", "--bucket", "96", "128",
        "--output-dir", str(out)])
    eval_video.main()
    txt = capsys.readouterr().out
    assert "seg_track" in txt
    assert (out / "box_track.json").exists()
    pngs = list((out / "seg_track" / "vid0").glob("*.png"))
    assert len(pngs) == 3
    assert Image.open(pngs[0]).mode == "RGBA"
