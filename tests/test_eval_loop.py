"""Evaluation loop plumbing: tiny model over synthetic COCO records."""
import dataclasses
import json

import numpy as np
import jax
import pytest
from PIL import Image

from test_model import small_cfg
from test_pipeline import coco_dir  # fixture
from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
from uninext_tpu.data.prompts import create_label_token_map
from uninext_tpu.data.tokenizer import BertTokenizer
from uninext_tpu.engine.evaluator import DetectionEvaluator
from uninext_tpu.models.detr import UninextDETR


def test_detection_eval_loop(coco_dir):
    cfg = small_cfg()
    dcfg = dataclasses.replace(cfg.data, min_size_test=64, max_size_test=96)
    cfg = dataclasses.replace(cfg, data=dcfg)
    records, cats = load_coco_json(str(coco_dir / "train.json"), str(coco_dir))
    records = records[:2]
    tok = BertTokenizer()
    mapper = UniDatasetMapper(cfg.data, cats, tok, is_train=False,
                              with_masks=False)
    ids, mask, cmap = create_label_token_map(cats, tok, cfg.data.max_text_len)

    import jax.numpy as jnp
    model = UninextDETR(cfg)
    s = mapper(records[0])
    args = [jnp.asarray(x[None]) for x in
            (s.image, s.img_mask, s.image_size, s.text_ids, s.text_mask)]
    params = jax.jit(lambda r: model.init(
        {"params": r}, *args, task="detection",
        train=False))(jax.random.PRNGKey(0))

    ev = DetectionEvaluator(model, cfg, cmap, with_masks=False)
    res = ev.evaluate(params["params"], records, mapper, score_thr=0.0)
    assert set(res) == {"AP", "AP50", "AP75", "APs", "APm", "APl"}
    # untrained model: AP finite (possibly ~0), never negative
    assert np.isfinite(res["AP"]) or np.isnan(res["AP"])
    if np.isfinite(res["AP"]):
        assert 0.0 <= res["AP"] <= 1.0


def test_res_mask_eval_loop(tmp_path):
    """RES evaluator: top-1 mask per expression -> mask P@0.5/oIoU/mIoU at
    original resolution (runs an untrained tiny model; checks plumbing +
    metric ranges)."""
    from uninext_tpu.data.coco import load_refcoco_json
    from uninext_tpu.data.mini_coco import make_mini_refcoco
    from uninext_tpu.engine.evaluator import evaluate_res
    from uninext_tpu.models.detr import init_all_paths

    cfg = small_cfg()
    dcfg = dataclasses.replace(cfg.data, min_size_test=64, max_size_test=96)
    cfg = dataclasses.replace(cfg, data=dcfg)
    paths = make_mini_refcoco(str(tmp_path), n_train=0, n_val=2, seed=1,
                              img_size=(120, 160))
    records = load_refcoco_json(paths["val_json"], paths["val_root"])[:3]
    tok = BertTokenizer()
    mapper = UniDatasetMapper(cfg.data, ["object"], tok, is_train=False,
                              with_masks=False)
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))["params"]
    out = evaluate_res(model, cfg, params, records, mapper)
    # full reference precision sweep (coco_evaluation.py:407)
    assert set(out) == {"P@0.5", "P@0.6", "P@0.7", "P@0.8", "P@0.9",
                        "oIoU", "mIoU"}
    for v in out.values():
        assert 0.0 <= v <= 1.0, out
