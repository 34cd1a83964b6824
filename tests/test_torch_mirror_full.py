"""Full-model torch-mirror parity vs the ACTUAL reference code.

Builds the reference UNINEXT_IMG composition (detectron2 ResNet -> Joiner ->
DeformableTransformerVLDINO -> DeformableDETRDINO -> DDETRSegmUniDN + BERT)
from /root/reference on CPU with random weights, converts its real
state_dict through engine/convert.py, and asserts end-to-end output parity
(boxes/logits/ious/masks, detection AND grounding) of UninextDETR — plus
converter key coverage (nothing silently unmapped in either direction).

This is the round-2 VERDICT task 1. Depth is shrunk (2 enc/2 dec/2 bert
layers, 60 queries) for CPU speed; every architectural feature of the
flagship image_joint_r50 stays on and all widths are full-size.
"""
import os

import numpy as np
import pytest

os.environ.setdefault("HF_HUB_OFFLINE", "1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/projects/UNINEXT"),
    reason="reference repo not mounted")

H, W, T = 128, 160, 32


@pytest.fixture(scope="module")
def mirror():
    import torch
    from tests.torch_mirror import (build_cfg, shrink_cfg,
                                    build_reference_model, make_image_list)
    cfg_t = shrink_cfg(build_cfg())
    model_t = build_reference_model(cfg_t, seed=0)
    torch.manual_seed(42)
    img = torch.randn(1, 3, H, W)
    ids = torch.randint(0, 30000, (1, T))
    tmask = torch.ones(1, T, dtype=torch.long)
    images = make_image_list(img, [(H, W)])
    ref = {}
    with torch.no_grad():
        lang = model_t.text_encoder({"input_ids": ids,
                                     "attention_mask": tmask})
        for task in ("detection", "grounding"):
            out, _ = model_t.detr.coco_inference(
                images, None, None, train=False,
                language_dict_features={k: v.clone() if hasattr(v, "clone")
                                        else v for k, v in lang.items()},
                task=task)
            ref[task] = {k: out[k].detach().numpy() for k in
                         ("pred_logits", "pred_boxes", "pred_masks",
                          "pred_boxious")}
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from uninext_tpu.config import (UninextConfig, LanguageConfig,
                                    TransformerConfig)
    from uninext_tpu.models.detr import UninextDETR, init_all_paths
    from uninext_tpu.engine.convert import convert_checkpoint

    cfg = UninextConfig(
        language=LanguageConfig(num_layers=2, max_len=T),
        transformer=TransformerConfig(enc_layers=2, dec_layers=2,
                                      num_queries=60),
        compute_dtype="float32")
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    new_params, report = convert_checkpoint(sd, params)

    inputs = dict(
        images=jnp.array(np.transpose(img.numpy(), (0, 2, 3, 1))),
        img_mask=jnp.zeros((1, H, W), bool),
        sizes=jnp.array([[H, W]], jnp.int32),
        tids=jnp.array(ids.numpy(), jnp.int32),
        tmask=jnp.array(tmask.numpy(), jnp.int32))
    return dict(sd=sd, ref=ref, report=report, model=model,
                params=new_params, inputs=inputs)


def test_converter_full_coverage(mirror):
    report = mirror["report"]
    sd = mirror["sd"]
    assert not report["missing_target"], report["missing_target"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert report["loaded"] > 400
    # every unconsumed source key must be a decoder-side ALIAS of a consumed
    # top-level head (deformable_detr.py:159-270 shares the same modules)
    for k in report["unused_source"]:
        assert ".transformer.decoder." in k, f"unmapped source key: {k}"
        alias = k.replace(".transformer.decoder.", ".")
        assert alias in sd, f"{k} has no consumed top-level alias"
        np.testing.assert_array_equal(sd[k], sd[alias])


def _run(mirror, task):
    out = mirror["model"].apply(
        mirror["params"], mirror["inputs"]["images"],
        mirror["inputs"]["img_mask"], mirror["inputs"]["sizes"],
        mirror["inputs"]["tids"], mirror["inputs"]["tmask"],
        task=task, train=False)
    return out


@pytest.mark.parametrize("task", ["detection", "grounding"])
def test_outputs_match_reference(mirror, task):
    out = _run(mirror, task)
    ref = mirror["ref"][task]
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]).squeeze(),
                               ref["pred_boxes"].squeeze(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]).squeeze(),
                               ref["pred_logits"].squeeze(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["pred_boxious"]).squeeze(),
                               ref["pred_boxious"].squeeze(), atol=5e-3)


def test_masks_match_reference(mirror):
    from uninext_tpu.models.detr import UninextDETR
    out = _run(mirror, "detection")
    shapes = ((H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32),
              (H // 64, W // 64))
    masks = mirror["model"].apply(
        mirror["params"], out["memory"], shapes, out["hs"],
        out["base_reference"], mirror["inputs"]["sizes"],
        method=UninextDETR.predict_masks)
    ref_masks = mirror["ref"]["detection"]["pred_masks"].squeeze(2)
    got = np.asarray(masks)
    assert got.shape == ref_masks.shape, (got.shape, ref_masks.shape)
    # mask logits span ~±40 after the CondInst stack; f32 noise accumulates
    # through conv+bilinear+dynamic-conv, so compare at 0.4% of that span and
    # additionally require binarized agreement
    np.testing.assert_allclose(got, ref_masks, atol=0.15)
    agree = np.mean((got > 0) == (ref_masks > 0))
    assert agree > 0.999, agree
