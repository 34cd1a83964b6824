"""VIS driver logic with a stubbed frame step: ids persist, scores aggregate."""
import numpy as np

from uninext_tpu.config import tiny_test_config
from uninext_tpu.engine.video_inference import VISDriver, TOPK_VIS


class StubDriver(VISDriver):
    def __init__(self, cfg, script):
        self.cfg = cfg
        self.params = None
        self._script = script

        def step(params, frame, img_masks, sizes, text_ids, text_mask):
            return self._script[int(frame)]

        self.step = step


def _frame_out(dets, C=5, h=16, w=24):
    """dets: list of (box, label, score, embed_seed)."""
    K = TOPK_VIS
    out = {
        "valid": np.zeros(K, bool),
        "boxes": np.zeros((K, 4), np.float32),
        "scores_full": np.zeros((K, C), np.float32),
        "labels": np.zeros(K, np.int64),
        "max_scores": np.zeros(K, np.float32),
        "mask_logits": np.full((K, h, w), -5.0, np.float32),
        "embeds": np.zeros((K, 8), np.float32),
        "boxes_cxcywh": np.zeros((K, 4), np.float32),
        "query_idx": np.arange(K),
    }
    rngs = np.random.RandomState(7)
    for i, (box, label, score, seed) in enumerate(dets):
        out["valid"][i] = True
        out["boxes"][i] = box
        out["labels"][i] = label
        out["max_scores"][i] = score
        out["scores_full"][i, label] = score
        e = np.random.RandomState(seed).randn(8) * 4
        out["embeds"][i] = e
        x0, y0, x1, y1 = [int(v / 8) for v in box]
        out["mask_logits"][i, y0:y1, x0:x1] = 5.0
    return out


def test_vis_driver_tracks_and_aggregates():
    cfg = tiny_test_config()
    # two objects with stable embeddings over 3 frames
    a = ([16, 16, 60, 60], 1, 0.9, 1)
    b = ([120, 80, 170, 120], 3, 0.8, 2)
    script = [_frame_out([a, b]), _frame_out([b, a]), _frame_out([a, b])]
    drv = StubDriver(cfg, script)
    frames = [np.int64(0), np.int64(1), np.int64(2)]
    sizes = np.array([[128, 192]], np.int32)
    out = drv.run_video(frames, None, sizes, None, None, ori_size=(64, 96))
    assert len(out["pred_scores"]) >= 2
    # each track spans all 3 frames (no Nones in the middle)
    for masks in out["pred_masks"]:
        assert len(masks) == 3
        assert all(m is not None for m in masks)
    labels = set(out["pred_labels"])
    assert {1, 3}.issubset(labels)
