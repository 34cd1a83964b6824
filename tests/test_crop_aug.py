"""Random-crop train augmentation (reference INPUT.CROP, VERDICT r2 #3).

Reference semantics being checked (coco_dataset_mapper_uni.py:118-124,
175-184; detectron2 augmentation_impl.py:354-414; augmentation.py:112-121):
  * 50% of train samples: [flip,] pre-resize(choice 400/500/600), RandomCrop
    (absolute_range), resize(choice min_size_train)
  * boxes clipped to the crop window; instances cropped away are filtered
  * masks follow boxes through the crop
  * positive maps stay slot-aligned (invalid slots zeroed)
  * ordinal expressions ("second dog from the left") disable crop
  * video: crop applied at raw resolution, clip-consistent in our design
"""
import json
import random

import numpy as np
import pytest
from PIL import Image

from uninext_tpu.config import DataConfig, image_joint_r50, video_joint_r50
from uninext_tpu.data.coco import (UniDatasetMapper, has_ordinal_num,
                                   sample_crop_size)
from uninext_tpu.data.video import VideoPairMapper


@pytest.fixture(scope="module")
def record(tmp_path_factory):
    root = tmp_path_factory.mktemp("crop")
    rng = np.random.RandomState(0)
    img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
    fp = root / "img.jpg"
    Image.fromarray(img).save(fp)

    def rect_poly(x, y, w, h):
        return [[x, y, x + w, y, x + w, y + h, x, y + h]]

    return {
        "file_name": str(fp), "image_id": 1, "height": 300, "width": 400,
        "annotations": [
            {"bbox": [120.0, 80.0, 160.0, 140.0], "category_id": 0,
             "segmentation": rect_poly(120, 80, 160, 140)},   # central, big
            {"bbox": [5.0, 5.0, 25.0, 25.0], "category_id": 1,
             "segmentation": rect_poly(5, 5, 25, 25)},        # corner, small
            {"bbox": [360.0, 260.0, 35.0, 35.0], "category_id": 2,
             "segmentation": rect_poly(360, 260, 35, 35)},    # far corner
        ],
        "task": "detection",
    }


CROP_CFG = dict(max_insts=8, max_text_len=48, min_size_train=(128,),
                max_size_train=320, crop_enabled=True,
                crop_size=(100, 200))


def test_flagship_presets_enable_crop():
    assert image_joint_r50().data.crop_enabled
    assert video_joint_r50().data.crop_enabled
    assert image_joint_r50().data.crop_size == (384, 600)


def test_sample_crop_size_absolute_range():
    rng = random.Random(0)
    for _ in range(200):
        ch, cw = sample_crop_size(300, 400, "absolute_range", (100, 200), rng)
        assert 100 <= ch <= 200 and 100 <= cw <= 200
    # window can never exceed the image
    ch, cw = sample_crop_size(80, 90, "absolute_range", (100, 200), rng)
    assert ch <= 80 and cw <= 90


def test_crop_boxes_stay_inside_and_filter(record):
    cfg = DataConfig(**CROP_CFG)
    mapper = UniDatasetMapper(cfg, ["cat", "dog", "bird"], is_train=True,
                              with_masks=False)
    cropped = dropped = 0
    for seed in range(40):
        s = mapper(record, random.Random(seed))
        h, w = s.image_size
        # valid boxes always normalized and non-degenerate
        b = s.boxes[s.valid]
        assert (b >= -1e-6).all() and (b <= 1 + 1e-6).all()
        assert (b[:, 2:] > 0).all()
        # xyxy corners inside the valid region
        x0 = b[:, 0] - b[:, 2] / 2
        x1 = b[:, 0] + b[:, 2] / 2
        assert (x0 >= -1e-5).all() and (x1 <= 1 + 1e-5).all()
        if abs(h / w - 300 / 400) > 0.03:   # aspect changed => crop fired
            cropped += 1
        if s.valid.sum() < 3:
            dropped += 1
    assert cropped > 5, "crop never fired in 40 seeds"
    assert dropped > 0, "aggressive crops never filtered a corner object"


def test_crop_mask_follows_box(record):
    cfg = DataConfig(**CROP_CFG)
    mapper = UniDatasetMapper(cfg, ["cat", "dog", "bird"], is_train=True,
                              with_masks=True)
    checked = 0
    for seed in range(25):
        s = mapper(record, random.Random(seed))
        h, w = s.image_size
        for i in np.where(s.valid)[0]:
            cx, cy, bw, bh = s.boxes[i]
            if bw * w < 12 or bh * h < 12:
                continue                      # sliver: stride-4 raster noise
            m = s.masks[i]                    # (Hb/4, Wb/4)
            ys, xs = np.nonzero(m)
            assert len(ys) > 0, (seed, i)
            stride = 4
            # mask extent within the (clipped) box, +/- one raster cell
            x0 = (cx - bw / 2) * w / stride - 1.5
            x1 = (cx + bw / 2) * w / stride + 1.5
            y0 = (cy - bh / 2) * h / stride - 1.5
            y1 = (cy + bh / 2) * h / stride + 1.5
            assert xs.min() >= x0 and xs.max() <= x1, (seed, i)
            assert ys.min() >= y0 and ys.max() <= y1, (seed, i)
            checked += 1
    assert checked > 20


def test_positive_map_slot_alignment(record):
    cfg = DataConfig(**CROP_CFG)
    mapper = UniDatasetMapper(cfg, ["cat", "dog", "bird"], is_train=True,
                              with_masks=False)
    for seed in range(40):
        s = mapper(record, random.Random(seed))
        pm = s.positive_map
        assert (pm[s.valid].sum(-1) >= 1).all()
        assert pm[~s.valid].sum() == 0


def test_ordinal_expression_disables_crop(record):
    assert has_ordinal_num(["the second dog from the left"])
    assert not has_ordinal_num(["the dog on the left"])
    assert not has_ordinal_num(None)
    ground = dict(record, task="grounding",
                  expressions=["the second dog from the left"])
    cfg_crop = DataConfig(**CROP_CFG)
    cfg_plain = DataConfig(**{**CROP_CFG, "crop_enabled": False})
    m_crop = UniDatasetMapper(cfg_crop, ["x"], is_train=True, with_masks=False)
    m_plain = UniDatasetMapper(cfg_plain, ["x"], is_train=True,
                               with_masks=False)
    for seed in range(10):
        a = m_crop(ground, random.Random(seed))
        b = m_plain(ground, random.Random(seed))
        # identical rng consumption => identical geometry
        np.testing.assert_array_equal(a.image_size, b.image_size)
        np.testing.assert_allclose(a.boxes, b.boxes)


def test_video_crop_clip_consistent(record, tmp_path):
    # two distinct frames of the same nominal size
    rng = np.random.RandomState(1)
    fps = []
    for t in range(2):
        img = (rng.rand(300, 400, 3) * 255).astype(np.uint8)
        fp = tmp_path / f"f{t}.jpg"
        Image.fromarray(img).save(fp)
        fps.append(str(fp))
    vid = {
        "video_id": 1, "file_names": fps, "length": 2,
        "height": 300, "width": 400,
        "tracks": [
            {"category_id": 0,
             "bboxes": [[120, 80, 160, 140], [125, 85, 160, 140]],
             "segmentations": [None, None]},
            {"category_id": 1,                       # disappears in frame 1
             "bboxes": [[5, 5, 25, 25], None],
             "segmentations": [None, None]},
        ],
        "task": "detection",
    }
    cfg = DataConfig(**CROP_CFG)
    mapper = VideoPairMapper(cfg, ["cat", "dog"], with_masks=False,
                             sampling_frame_range=1)
    saw_absent = False
    for seed in range(20):
        k, r = mapper(vid, random.Random(seed))
        # clip-consistent geometry: same bucket, same valid-region size
        assert k.image.shape == r.image.shape
        np.testing.assert_array_equal(k.image_size, r.image_size)
        # identical prompt even when per-frame validity differs
        np.testing.assert_array_equal(k.text_ids, r.text_ids)
        for s in (k, r):
            b = s.boxes[s.valid]
            assert (b >= -1e-6).all() and (b <= 1 + 1e-6).all()
        # track 1 absent in whichever frame index 1 was sampled for
        both = int(k.valid[1]) + int(r.valid[1])
        if both < 2:
            saw_absent = True
    assert saw_absent
