"""mini_coco generator: files must be genuine COCO format end-to-end."""
import json

import numpy as np
from PIL import Image

from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
from uninext_tpu.data.masks import polygons_to_mask
from uninext_tpu.config import DataConfig
from uninext_tpu.data.mini_coco import make_mini_coco


def test_mini_coco_is_real_coco_format(tmp_path):
    paths = make_mini_coco(str(tmp_path), n_train=3, n_val=2, seed=1)
    with open(paths["train_json"]) as f:
        js = json.load(f)
    assert {"images", "annotations", "categories"} <= set(js)
    # non-contiguous category ids, like real COCO
    assert [c["id"] for c in js["categories"]] == [1, 3, 7]
    for a in js["annotations"]:
        assert set(a) >= {"id", "image_id", "category_id", "bbox",
                          "segmentation", "area", "iscrowd"}
        x, y, w, h = a["bbox"]
        assert w > 0 and h > 0
        # polygon consistent with bbox
        m = None
        img = next(i for i in js["images"] if i["id"] == a["image_id"])
        m = polygons_to_mask(a["segmentation"], img["height"], img["width"])
        ys, xs = np.nonzero(m)
        assert len(xs) > 0
        assert xs.min() >= x - 2 and xs.max() <= x + w + 2
        assert ys.min() >= y - 2 and ys.max() <= y + h + 2

    records, cats = load_coco_json(paths["train_json"], paths["train_root"])
    assert len(records) == 3
    assert cats == ["red square", "green disk", "blue triangle"]
    # files decode and map through the production mapper
    img = Image.open(records[0]["file_name"])
    assert img.size == (records[0]["width"], records[0]["height"])
    cfg = DataConfig(max_insts=8, max_text_len=32, min_size_train=(64,),
                     max_size_train=128)
    mapper = UniDatasetMapper(cfg, cats, is_train=True, with_masks=True)
    s = mapper(records[0])
    assert s.valid.sum() >= 1
    assert np.isfinite(s.image).all()


def test_make_mini_ytvis_loads_through_registry_schema(tmp_path):
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.video import load_ytvis_json
    p = make_mini_ytvis(str(tmp_path), n_train=2, n_val=1, length=3)
    recs, cats = load_ytvis_json(p["train_json"], p["train_root"])
    assert len(recs) == 2 and len(cats) == 3
    r = recs[0]
    assert r["length"] == 3 and len(r["file_names"]) == 3
    assert r["tracks"] and len(r["tracks"][0]["bboxes"]) == 3
    import os
    assert all(os.path.exists(f) for f in r["file_names"])


def test_make_mini_refcoco_expressions_resolvable(tmp_path):
    from uninext_tpu.data.coco import load_refcoco_json
    from uninext_tpu.data.mini_coco import make_mini_refcoco
    p = make_mini_refcoco(str(tmp_path), n_train=4, n_val=2)
    recs = load_refcoco_json(p["train_json"], p["train_root"])
    assert recs and all(r["task"] == "grounding" for r in recs)
    # every record grounds exactly one object with >= 2 expressions
    for r in recs:
        assert len(r["annotations"]) == 1
        assert len(r["expressions"]) >= 2
