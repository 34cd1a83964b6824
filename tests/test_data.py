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
