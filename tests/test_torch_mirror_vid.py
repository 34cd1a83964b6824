"""Full VIDEO-model torch-mirror parity vs the ACTUAL reference code.

Builds the reference UNINEXT_VID composition (DDETRSegmUniVIDDN with the
deformable reid head, 4-channel template ref_backbone, and SOT FeatureFuser
— the video_joint_r50 flagship flags) on CPU with random weights, converts
its state_dict through engine/convert.py, and asserts:
  * converter key coverage over all video-specific params,
  * frame-inference parity incl. the deformable-reid instance embeddings,
  * SOT template-prompt parity (get_template_4c crop with the box-filled
    mask channel -> template backbone -> P3-P6 fusion -> adjust_layer) and
    the VOS variant with a real gt-mask channel.

Reference anchors: ddetrs_vid_dn.py:30-64 (init), :497-545
(coco_inference_ref), ddetrs_dn.py:449-457 (reid at inference).
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
def vid_mirror():
    import torch
    from tests.torch_mirror import (build_vid_cfg, shrink_cfg,
                                    build_reference_vid_model,
                                    make_image_list)
    cfg_t = shrink_cfg(build_vid_cfg())
    model_t = build_reference_vid_model(cfg_t, seed=0)
    torch.manual_seed(42)
    img = torch.randn(1, 3, H, W)
    ids = torch.randint(0, 30000, (1, T))
    tmask = torch.ones(1, T, dtype=torch.long)
    images = make_image_list(img, [(H, W)])
    box = torch.tensor([[40.0, 30.0, 104.0, 94.0]])     # xyxy
    gt_mask = torch.zeros(1, H, W)
    gt_mask[:, 40:80, 50:90] = 1.0

    ref = {}
    with torch.no_grad():
        lang = model_t.text_encoder({"input_ids": ids,
                                     "attention_mask": tmask})
        out, _ = model_t.detr.coco_inference(
            images, None, None, train=False,
            language_dict_features={k: v.clone() if hasattr(v, "clone")
                                    else v for k, v in lang.items()},
            task="detection")
        ref["frame"] = {k: out[k].detach().numpy() for k in
                        ("pred_logits", "pred_boxes", "pred_boxious",
                         "pred_inst_embed")}
        # SOT template init (box only -> box-filled 4th channel)
        lt, _ = model_t.detr.coco_inference_ref(
            [img[0]], [{"bboxes_unorm": box.clone()}])
        ref["template_sot"] = {k: v.detach().numpy() for k, v in lt.items()}
        # VOS template init (gt mask channel)
        lt2, _ = model_t.detr.coco_inference_ref(
            [img[0]], [{"bboxes_unorm": box.clone(), "masks": gt_mask}])
        ref["template_vos"] = {k: v.detach().numpy() for k, v in lt2.items()}
    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}

    import jax
    import jax.numpy as jnp
    from uninext_tpu.config import (UninextConfig, LanguageConfig,
                                    TransformerConfig)
    from uninext_tpu.models.detr import UninextDETR, init_all_paths
    from uninext_tpu.engine.convert import convert_checkpoint
    import dataclasses

    cfg = UninextConfig(
        language=LanguageConfig(num_layers=2, max_len=T),
        transformer=TransformerConfig(enc_layers=2, dec_layers=2,
                                      num_queries=60),
        use_reid=True, use_deformable_reid=True, n_layer_deformable_reid=2,
        detach_reid=True,
        compute_dtype="float32")
    cfg = dataclasses.replace(
        cfg, sot=dataclasses.replace(cfg.sot,
                                     extra_backbone_for_template=True,
                                     feature_fusion=True))
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    new_params, report = convert_checkpoint(sd, params)

    inputs = dict(
        image=jnp.array(np.transpose(img.numpy(), (0, 2, 3, 1))),
        img_mask=jnp.zeros((1, H, W), bool),
        sizes=jnp.array([[H, W]], jnp.int32),
        tids=jnp.array(ids.numpy(), jnp.int32),
        tmask=jnp.array(tmask.numpy(), jnp.int32),
        box=jnp.array(box.numpy()),
        gt_mask=jnp.array(gt_mask.numpy()))
    return dict(sd=sd, ref=ref, report=report, model=model, cfg=cfg,
                params=new_params, inputs=inputs)


def test_vid_converter_coverage(vid_mirror):
    report = vid_mirror["report"]
    sd = vid_mirror["sd"]
    assert not report["missing_target"], report["missing_target"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    # every video-specific family must have been consumed
    for k in report["unused_source"]:
        assert not k.startswith("detr.reid_embed_head"), k
        assert not k.startswith("detr.sot_fuser"), k
        assert not k.startswith("detr.adjust_layer"), k
        assert "ref_backbone" not in k, k
        assert ".transformer.decoder." in k, f"unmapped source key: {k}"
        alias = k.replace(".transformer.decoder.", ".")
        assert alias in sd, f"{k} has no consumed top-level alias"
        np.testing.assert_array_equal(sd[k], sd[alias])


def test_vid_frame_and_reid_match_reference(vid_mirror):
    m = vid_mirror
    out = m["model"].apply(
        m["params"], m["inputs"]["image"], m["inputs"]["img_mask"],
        m["inputs"]["sizes"], m["inputs"]["tids"], m["inputs"]["tmask"],
        task="detection", train=False)
    ref = m["ref"]["frame"]
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]).squeeze(),
                               ref["pred_boxes"].squeeze(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]).squeeze(),
                               ref["pred_logits"].squeeze(), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["pred_embeds"]).squeeze(),
                               ref["pred_inst_embed"].squeeze(), atol=5e-3)


@pytest.mark.parametrize("variant", ["template_sot", "template_vos"])
def test_vid_template_prompt_matches_reference(vid_mirror, variant):
    """crop_template + encode_template == the reference coco_inference_ref
    (integer crop bounds, box-filled / gt-mask 4th channel, template
    backbone, P3-P6 fusion at full stride-8 resolution, adjust_layer,
    pad-mask-derived prompt masks)."""
    from uninext_tpu.models.detr import UninextDETR
    from uninext_tpu.models.sot import crop_template
    m = vid_mirror
    cfg = m["cfg"]
    gt = m["inputs"]["gt_mask"] if variant == "template_vos" else None
    crop, pad = crop_template(m["inputs"]["image"], m["inputs"]["box"],
                              cfg.sot.template_size,
                              cfg.sot.search_area_factor,
                              gt_masks=gt, mask_channel=True)
    lang = m["model"].apply(m["params"], crop, pad,
                            method=UninextDETR.encode_template)
    ref = m["ref"][variant]
    got_mask = np.asarray(lang["masks"]).astype(bool)
    np.testing.assert_array_equal(got_mask, ref["masks"])
    np.testing.assert_allclose(np.asarray(lang["hidden"]), ref["hidden"],
                               atol=5e-3)
