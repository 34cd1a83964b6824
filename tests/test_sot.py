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
    out = np.asarray(crop_template(jnp.array(img[None]), jnp.array(box),
                                   template_size=32, search_area_factor=1.0))
    # factor 1 -> crop side = sqrt(32*32) = 32 exactly the box
    ref = img[12:44, 20:52]
    np.testing.assert_allclose(out[0], ref, atol=1e-4)


def test_crop_template_zero_padding_outside():
    img = np.ones((32, 32, 3), np.float32)
    box = np.array([[-10.0, -10.0, 10.0, 10.0]])  # mostly outside
    out = np.asarray(crop_template(jnp.array(img[None]), jnp.array(box),
                                   template_size=16, search_area_factor=1.0))
    assert out[0, 0, 0, 0] == 0.0          # top-left is outside -> zero
    assert out[0, -1, -1, 0] > 0.5          # bottom-right is inside


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
        crop = crop_template(images, jnp.array([[10., 10., 40., 40.]] * B),
                             cfg.sot.template_size, cfg.sot.search_area_factor)
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


def test_soft_aggregate():
    p1 = np.zeros((8, 8), np.float32)
    p1[:4] = 0.9
    p2 = np.zeros((8, 8), np.float32)
    p2[6:] = 0.8
    lab = soft_aggregate(np.stack([p1, p2]))
    assert lab[0, 0] == 1 and lab[7, 0] == 2 and lab[5, 0] == 0
