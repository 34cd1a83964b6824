"""Data pipeline units: tokenizer char mapping, positive maps, RLE masks."""
import numpy as np

from uninext_tpu.data import masks as mask_util
from uninext_tpu.data.prompts import (build_detection_prompt,
                                      create_label_token_map,
                                      tokenize_with_positive_map)
from uninext_tpu.data.tokenizer import BertTokenizer


def test_detection_prompt_spans():
    text, spans = build_detection_prompt(["person", "traffic light", "dog"])
    assert text == "person. traffic light. dog"
    for (s, e), name in zip(spans, ["person", "traffic light", "dog"]):
        assert text[s:e] == name


def test_positive_map_marks_class_tokens():
    tok = BertTokenizer()
    text, spans = build_detection_prompt(["person", "traffic light", "dog"])
    ids, mask, pm = tokenize_with_positive_map(
        text, [[spans[1]], [spans[0]]], tok, 32)
    assert ids.shape == (32,) and pm.shape == (2, 32)
    # object 0 -> "traffic light" = 2 tokens; object 1 -> "person" = 1 token
    assert pm[0].sum() == 2
    assert pm[1].sum() == 1
    # maps only cover valid (attended) positions
    assert np.all(mask[np.where(pm.any(0))[0]] == 1)
    # no overlap between the two class spans
    assert not np.any(pm[0] & pm[1])


def test_label_token_map():
    tok = BertTokenizer()
    ids, mask, cmap = create_label_token_map(["cat", "dog", "fire hydrant"],
                                             tok, 32)
    assert cmap.shape == (3, 32)
    assert cmap[0].sum() == 1 and cmap[2].sum() == 2


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    m = (rng.rand(37, 23) > 0.6).astype(np.uint8)
    rle = mask_util.encode_mask(m)
    back = mask_util.decode_mask(rle)
    np.testing.assert_array_equal(m, back)


def test_polygon_rasterization():
    poly = [[2.0, 2.0, 10.0, 2.0, 10.0, 8.0, 2.0, 8.0]]  # rectangle
    m = mask_util.polygons_to_mask(poly, 12, 14)
    assert m[5, 5] == 1 and m[0, 0] == 0 and m[11, 13] == 0
    assert m.sum() >= 7 * 9 - 4  # approximately the rectangle area


def test_pseudo_video_pairs_use_independent_aug(tmp_path):
    """Pseudo-videos from stills get independent per-frame augmentation
    (reference DetrDatasetMapperUniCLIP); real clips stay clip-consistent."""
    import random

    import numpy as np
    from PIL import Image

    from uninext_tpu.config import DataConfig
    from uninext_tpu.data.video import VideoPairMapper, pseudo_video_from_image

    rng = np.random.RandomState(0)
    img = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
    fp = tmp_path / "x.jpg"
    Image.fromarray(img).save(fp)
    record = {"file_name": str(fp), "image_id": 7, "height": 80,
              "width": 120,
              "annotations": [{"bbox": [10, 10, 40, 30], "category_id": 0,
                               "segmentation": None}]}
    vid = pseudo_video_from_image(record, length=2)
    assert vid["pseudo"]
    cfg = DataConfig(max_insts=4, max_text_len=32,
                     min_size_train=(48, 64), max_size_train=96)
    mapper = VideoPairMapper(cfg, ["thing"], is_train=True,
                             with_masks=False)
    # across many seeds, the two frames must sometimes get different
    # geometry (scale bucket or flip) — impossible under clip-consistent aug
    diff = 0
    for seed in range(12):
        k, r = mapper(vid, random.Random(seed))
        if k.image.shape != r.image.shape or not np.allclose(
                k.boxes[k.valid], r.boxes[r.valid]):
            diff += 1
    assert diff > 0
    # a REAL clip record (no pseudo flag) keeps consistent geometry
    vid2 = dict(vid)
    vid2.pop("pseudo")
    for seed in range(6):
        k, r = mapper(vid2, random.Random(seed))
        assert k.image.shape == r.image.shape
        np.testing.assert_allclose(k.boxes[k.valid], r.boxes[r.valid])


def test_referring_mini_ytvis_fixture(tmp_path):
    """R-VOS fixture: expressions table + single annotated target per video
    with distractors in the pixels; the video mapper produces a grounding
    pair whose positive map hits only the target slot."""
    import random

    from uninext_tpu.config import DataConfig
    from uninext_tpu.data.mini_coco import make_mini_ytvis
    from uninext_tpu.data.video import VideoPairMapper, load_ytvis_json

    paths = make_mini_ytvis(str(tmp_path), n_train=3, n_val=2,
                            referring=True, max_objects=3, seed=5)
    recs, cats = load_ytvis_json(paths["train_json"], paths["train_root"],
                                 has_expression=True)
    assert len(recs) == 3
    for r in recs:
        assert r["task"] == "grounding"
        assert len(r["tracks"]) == 1              # only the referred target
        expr = r["expressions"][0]
        assert expr.startswith("the ")
        # the expression names the annotated track's category
        assert cats[r["tracks"][0]["category_id"]] in expr

    cfg = DataConfig(max_insts=4, max_text_len=32,
                     min_size_train=(96,), max_size_train=128,
                     crop_enabled=False)
    mapper = VideoPairMapper(cfg, cats, tokenizer=None,
                             sampling_frame_range=3)
    key, ref = mapper(recs[0], random.Random(0))
    assert key.text_ids.any()                      # expression tokenized
    # grounding positive map: valid slots point at the pooled token (col 0)
    assert key.positive_map[key.valid, 0].all()
    assert not key.positive_map[~key.valid].any()
    assert key.positive_map.shape == ref.positive_map.shape
