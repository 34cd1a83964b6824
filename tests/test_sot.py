"""SOT template machinery: crop numerics, pseudo-prompt encoding, VOS merge."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from test_model import small_cfg, make_batch, B, H, W, T
from uninext_tpu.engine.sot_inference import soft_aggregate
from uninext_tpu.models.detr import UninextDETR
from uninext_tpu.models.sot import crop_template, resize_level


def test_crop_template_identity_region():
    # crop of a linear-gradient image around a centered box approximates the
    # same region resampled by PIL
    from PIL import Image
    rng = np.random.RandomState(0)
    img = rng.rand(64, 80, 3).astype(np.float32)
    box = np.array([[20.0, 12.0, 52.0, 44.0]])  # 32x32 box
    crop, pad = crop_template(jnp.array(img[None]), jnp.array(box),
                              template_size=32, search_area_factor=1.0)
    out = np.asarray(crop)
    # factor 1 -> crop side = sqrt(32*32) = 32 exactly the box; the
    # reference's boundary quirk zeroes the last row/col of content when
    # the window touches it, so compare the interior
    ref = img[12:44, 20:52]
    np.testing.assert_allclose(out[0, :-1, :-1], ref[:-1, :-1], atol=1e-4)
    assert not np.asarray(pad).any()


def test_crop_template_zero_padding_outside():
    img = np.ones((32, 32, 3), np.float32)
    box = np.array([[-10.0, -10.0, 10.0, 10.0]])  # mostly outside
    crop, pad = crop_template(jnp.array(img[None]), jnp.array(box),
                              template_size=16, search_area_factor=1.0)
    out = np.asarray(crop)
    assert out[0, 0, 0, 0] == 0.0          # top-left is outside -> zero
    assert out[0, -1, -1, 0] > 0.5          # bottom-right is inside
    p = np.asarray(pad)
    assert p[0, 0, 0] and not p[0, -2, -2]  # pad mask mirrors that


def test_resize_level_constant_preserved():
    x = jnp.full((1, 10, 14, 4), 3.5)
    y = np.asarray(resize_level(x, 8))
    assert y.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(y, 3.5, atol=1e-5)


def test_encode_template_and_sot_forward():
    cfg = small_cfg()
    model = UninextDETR(cfg)
    images, img_mask, sizes, tids, tmask, _ = make_batch(0)

    def sot_forward(mod, images, img_mask, sizes, crop):
        lang = mod.encode_template(crop)
        out = mod(images, img_mask, sizes, None, None, task="grounding",
                  train=False, lang_dict=lang)
        return lang, out

    @jax.jit
    def run(rng):
        crop, _ = crop_template(images,
                                jnp.array([[10., 10., 40., 40.]] * B),
                                cfg.sot.template_size,
                                cfg.sot.search_area_factor)
        params = model.init({"params": rng}, images, img_mask, sizes, crop,
                            method=sot_forward)
        return model.apply(params, images, img_mask, sizes, crop,
                           method=sot_forward)

    lang, out = run(jax.random.PRNGKey(0))
    r = cfg.sot.ref_feat_size
    L = cfg.transformer.num_feature_levels
    assert lang["hidden"].shape == (B, L * r * r, cfg.language.hidden_dim)
    assert out["pred_logits"].shape == (B, cfg.transformer.num_queries, 1)
    assert np.all(np.isfinite(np.asarray(out["pred_logits"])))


def test_encode_template_vit_template_backbone():
    """ViT-family template branch: the 4ch template backbone mirrors the
    MAIN backbone family (reference uninext_vid.py:160-167 builds
    MaskedBackbone(cfg, channels=4) — a 4ch D2ViT for the ViT-H config)."""
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(
            cfg.backbone, name="vit_huge", vit_embed_dim=32, vit_depth=2,
            vit_num_heads=2, vit_window_size=4, vit_global_blocks=(1,),
            out_channels=(16, 32, 32), vit_flash_attn=False),
        sot=dataclasses.replace(cfg.sot, extra_backbone_for_template=True,
                                feature_fusion=True, template_size=32))
    model = UninextDETR(cfg)
    crop = jnp.zeros((1, 32, 32, 4))
    pad = jnp.zeros((1, 32, 32), bool)

    @jax.jit
    def run(r):
        params = model.init({"params": r}, crop, pad,
                            method=UninextDETR.encode_template)
        return params, model.apply(params, crop, pad,
                                   method=UninextDETR.encode_template)

    params, lang = run(jax.random.PRNGKey(0))
    assert "patch_embed" in params["params"]["template_backbone"]
    assert np.all(np.isfinite(np.asarray(lang["hidden"])))


def test_soft_aggregate():
    p1 = np.zeros((8, 8), np.float32)
    p1[:4] = 0.9
    p2 = np.zeros((8, 8), np.float32)
    p2[6:] = 0.8
    lab = soft_aggregate(np.stack([p1, p2]))
    assert lab[0, 0] == 1 and lab[7, 0] == 2 and lab[5, 0] == 0
