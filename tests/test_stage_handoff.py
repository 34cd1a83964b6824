"""Stage-to-stage weight hand-off (engine/checkpoint.load_stage_weights).

The reference's 3-stage pipeline (assets/TRAIN.md) hands weights forward via
DetectionCheckpointer's shape-skipping load plus the
conversion/convert_3c_to_4c_pth.py inflation; these tests pin the flax->flax
equivalent: exact-path copy, template_backbone<-backbone remap, 3->4ch conv
inflation, shape-mismatch skip, and missing-tower init preservation.
"""
import numpy as np
import jax.numpy as jnp

from uninext_tpu.engine.checkpoint import load_stage_weights


def _image_tree(seed=0):
    r = np.random.RandomState(seed)
    return {
        "backbone": {
            "conv1": {"kernel": jnp.asarray(r.randn(7, 7, 3, 8), jnp.float32)},
            "block": {"w": jnp.asarray(r.randn(8, 16), jnp.float32)},
        },
        "head": {"w": jnp.asarray(r.randn(16, 4), jnp.float32),
                 "b": jnp.zeros((4,), jnp.float32)},
    }


def _video_tree():
    base = _image_tree(seed=99)
    base["template_backbone"] = {
        "conv1": {"kernel": jnp.zeros((7, 7, 4, 8), jnp.float32) + 0.5},
        "block": {"w": jnp.zeros((8, 16), jnp.float32) + 0.5},
    }
    base["reid_embed"] = {"w": jnp.zeros((16, 16), jnp.float32) + 0.25}
    return base


def test_exact_copy_and_report():
    src = _image_tree(seed=1)
    tgt = _image_tree(seed=2)
    out, rep = load_stage_weights(tgt, src, verbose=False)
    assert rep["loaded"] == 4 and not rep["missing"] and not rep["mismatched"]
    np.testing.assert_array_equal(out["head"]["w"], src["head"]["w"])
    np.testing.assert_array_equal(out["backbone"]["conv1"]["kernel"],
                                  src["backbone"]["conv1"]["kernel"])


def test_template_remap_with_inflation():
    src = _image_tree(seed=3)
    tgt = _video_tree()
    out, rep = load_stage_weights(tgt, src, verbose=False)
    # template tower loads from the image backbone: conv1 inflated 3->4ch
    # (zero 4th channel), plain leaves copied verbatim
    k = np.asarray(out["template_backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        k[:, :, :3], np.asarray(src["backbone"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(k[:, :, 3], np.zeros((7, 7, 8)))
    np.testing.assert_array_equal(out["template_backbone"]["block"]["w"],
                                  src["backbone"]["block"]["w"])
    assert rep["inflated"] == 1 and rep["remapped_template"] == 2
    # towers absent from the image stage keep their fresh init
    np.testing.assert_array_equal(out["reid_embed"]["w"],
                                  np.asarray(tgt["reid_embed"]["w"]))
    assert rep["missing"] == ["reid_embed/w"]


def test_shape_mismatch_skipped():
    src = _image_tree(seed=4)
    src["head"]["w"] = jnp.zeros((16, 11), jnp.float32)  # wrong fan-out
    tgt = _image_tree(seed=5)
    out, rep = load_stage_weights(tgt, src, verbose=False)
    np.testing.assert_array_equal(out["head"]["w"],
                                  np.asarray(tgt["head"]["w"]))
    assert len(rep["mismatched"]) == 1 and "head/w" in rep["mismatched"][0]
    assert rep["loaded"] == 3


def test_inflate_disabled():
    src = _image_tree(seed=6)
    tgt = _video_tree()
    out, rep = load_stage_weights(tgt, src, inflate_4c=False, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(out["template_backbone"]["conv1"]["kernel"]),
        np.asarray(tgt["template_backbone"]["conv1"]["kernel"]))
    assert rep["inflated"] == 0 and len(rep["mismatched"]) == 1
