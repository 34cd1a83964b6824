"""End-to-end data pipeline: synthetic COCO json -> mapper -> loader batch."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from uninext_tpu.config import DataConfig
from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
from uninext_tpu.data.loader import MultiDatasetLoader, collate
from uninext_tpu.data.video import (VideoPairMapper, collate_video,
                                    pseudo_video_from_image)


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(4):
        w, h = 120 + 8 * i, 90 + 6 * i
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            root / f"img{i}.jpg")
        images.append({"id": i, "file_name": f"img{i}.jpg",
                       "height": h, "width": w})
        for _ in range(3):
            x, y = rng.randint(0, w // 2), rng.randint(0, h // 2)
            bw, bh = rng.randint(10, w // 2), rng.randint(10, h // 2)
            annotations.append({
                "id": aid, "image_id": i,
                "category_id": int(rng.choice([1, 2, 5])),
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "segmentation": [[x, y, x + bw, y, x + bw, y + bh, x, y + bh]],
                "iscrowd": 0, "area": float(bw * bh)})
            aid += 1
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"},
                           {"id": 5, "name": "fire hydrant"}]}
    with open(root / "train.json", "w") as f:
        json.dump(coco, f)
    return root


def test_mapper_and_loader(coco_dir):
    cfg = DataConfig(max_insts=8, max_text_len=32,
                     min_size_train=(64, 96), max_size_train=160,
                     size_divisibility=32)
    records, cats = load_coco_json(str(coco_dir / "train.json"), str(coco_dir))
    assert cats == ["cat", "dog", "fire hydrant"]
    assert len(records) == 4
    mapper = UniDatasetMapper(cfg, cats, is_train=True)
    loader = MultiDatasetLoader([(records, mapper, 2)], [1.0], seed=0)
    batch = next(iter(loader))
    B, (Hb, Wb) = 2, batch["images"].shape[1:3]
    assert Hb % 32 == 0 and Wb % 32 == 0
    assert batch["images"].shape == (B, Hb, Wb, 3)
    assert batch["targets"]["boxes"].shape == (B, 8, 4)
    assert batch["targets"]["positive_map"].shape == (B, 8, 32)
    assert batch["targets"]["masks"].shape == (B, Hb // 4, Wb // 4)[0:1] + \
        (8, Hb // 4, Wb // 4)
    v = batch["targets"]["valid"]
    assert v.sum() == 6  # 3 objects x 2 images
    b = batch["targets"]["boxes"][v]
    assert (b >= 0).all() and (b <= 1).all()
    # every valid object has at least one positive token on a valid position
    pm = batch["targets"]["positive_map"][v]
    assert (pm.sum(-1) >= 1).all()


def test_video_pair_mapper(coco_dir):
    cfg = DataConfig(max_insts=8, max_text_len=32,
                     min_size_train=(64,), max_size_train=160)
    records, cats = load_coco_json(str(coco_dir / "train.json"), str(coco_dir))
    vid = pseudo_video_from_image(records[0], length=3)
    mapper = VideoPairMapper(cfg, cats)
    key_s, ref_s = mapper(vid)
    assert key_s.image.shape == ref_s.image.shape
    assert key_s.valid.sum() == ref_s.valid.sum() == 3
    batch = collate_video([(key_s, ref_s)])
    assert batch["images_key"].shape == batch["images_ref"].shape
    assert batch["targets_key"]["boxes"].shape == (1, 8, 4)
    # pseudo-videos augment each frame INDEPENDENTLY (reference
    # DetrDatasetMapperUniCLIP), so the frames may differ by an hflip:
    # cy/w/h always agree, cx agrees either directly or mirrored.
    kb = np.asarray(batch["targets_key"]["boxes"][0])
    rb = np.asarray(batch["targets_ref"]["boxes"][0])
    np.testing.assert_allclose(kb[:, 1:], rb[:, 1:], atol=1e-6)
    same = np.allclose(kb[:3, 0], rb[:3, 0], atol=1e-6)
    mirrored = np.allclose(kb[:3, 0], 1.0 - rb[:3, 0], atol=1e-6)
    assert same or mirrored, (kb[:3, 0], rb[:3, 0])
