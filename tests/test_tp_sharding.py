"""Tensor parallelism of the heavy towers over the mesh "model" axis.

The reference has no TP (SURVEY §2.5 — DDP only); parallel/sharding.py adds
Megatron-style column/row-parallel linears for the ViT backbone and BERT as
pure sharding annotations. Validated here on a 2dp x 2tp virtual CPU mesh:
params and Adam state actually shard, the train step runs, and the loss
matches the replicated (tp=off) run bit-for-bit-ish.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_model import small_cfg, B, H, W, T
from uninext_tpu.engine.train import create_train_state, make_train_step
from uninext_tpu.parallel.mesh import create_mesh, shard_batch


def vit_cfg():
    cfg = small_cfg()
    return dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(
            cfg.backbone, name="vit_huge", vit_embed_dim=32, vit_depth=2,
            vit_num_heads=2, vit_window_size=4, vit_global_blocks=(1,),
            out_channels=(16, 32, 32), vit_flash_attn=False,
            vit_drop_path_rate=0.0))


def make_tp_batch(seed=0):
    rng = np.random.RandomState(seed)
    G = 8
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    pm = np.zeros((B, G, T), bool)
    boxes[:, :3] = [0.4, 0.5, 0.2, 0.3]
    valid[:, :3] = True
    pm[:, :3, 2] = True
    return {
        "images": jnp.array(rng.randn(B, H, W, 3), jnp.float32),
        "img_mask": jnp.zeros((B, H, W), bool),
        "image_sizes": jnp.array([[H, W]] * B, jnp.int32),
        "text_ids": jnp.array(rng.randint(0, 1000, (B, T)), jnp.int32),
        "text_mask": jnp.ones((B, T), jnp.int32),
        "targets": {
            "boxes": jnp.array(boxes), "valid": jnp.array(valid),
            "positive_map": jnp.array(pm),
            "masks": jnp.array((rng.rand(B, G, H // 4, W // 4) > 0.7)
                               .astype(np.float32)),
        },
    }


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_tp_train_step_sharded_and_parity():
    cfg = vit_cfg()
    batch = make_tp_batch()
    mesh = create_mesh(2, devices=jax.devices()[:4])   # 2 dp x 2 tp

    with jax.set_mesh(mesh):
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          mesh=mesh, tp=True)
        # column-parallel qkv kernel shards its output features; Adam mu too
        qkv = state.params["backbone"]["block_0"]["attn"]["qkv"]["kernel"]
        spec = qkv.sharding.spec
        assert tuple(spec) == (None, "model"), spec
        mlp2 = state.params["backbone"]["block_0"]["mlp2"]["kernel"]
        assert tuple(mlp2.sharding.spec) == ("model", None)
        mu = jax.tree_util.tree_leaves_with_path(state.opt_state)
        mu_qkv = [l for p, l in mu
                  if "qkv" in str(p) and "kernel" in str(p) and l.ndim == 2]
        assert mu_qkv and all(tuple(l.sharding.spec) == (None, "model")
                              for l in mu_qkv)
        # the small DETR transformer stays replicated
        lvl = state.params["transformer"]["level_embed"]
        assert not any(lvl.sharding.spec)

        step = make_train_step(model, cfg, task="detection", mesh=mesh,
                               tp=True)
        sharded_batch = jax.device_put(batch, shard_batch(mesh))
        new_state, metrics = step(state, sharded_batch, jax.random.PRNGKey(1))
        total_tp = float(metrics["total_loss"])
        assert np.isfinite(total_tp)
        # updated params keep their TP shardings (no silent gather-back)
        qkv2 = new_state.params["backbone"]["block_0"]["attn"]["qkv"]["kernel"]
        assert tuple(qkv2.sharding.spec) == (None, "model")

    # parity vs the replicated data-parallel-only path, same seeds
    mesh_dp = create_mesh(1, devices=jax.devices()[:2])
    with jax.set_mesh(mesh_dp):
        model2, state2 = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        step2 = make_train_step(model2, cfg, task="detection", mesh=mesh_dp)
        _, metrics2 = step2(state2, jax.device_put(batch,
                                                   shard_batch(mesh_dp)),
                            jax.random.PRNGKey(1))
    total_dp = float(metrics2["total_loss"])
    np.testing.assert_allclose(total_tp, total_dp, rtol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_flash_attention_tp_headshard_parity(monkeypatch):
    """VERDICT r4 #5: the flash global-attention path now runs under tensor
    parallelism via a shard_map head-shard wrapper (models/vit.py
    flash_rel_pos_attention_tp) instead of forcing vit_flash_attn=False.

    On CPU the Pallas kernel is substituted with the plain-XLA reference
    (same shim as test_vit_parity): this validates the TP WIRING exactly —
    head slicing, replicated rel-pos tables, head-major output layout —
    against the unsharded path; the kernel numerics are TPU-validated
    elsewhere."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa_mod
    from jax.sharding import PartitionSpec as P
    from uninext_tpu.models.vit import (flash_rel_pos_attention,
                                        flash_rel_pos_attention_tp)

    def plain_flash(q, k, v, ab=None, segment_ids=None, *, causal=False,
                    sm_scale=1.0, block_sizes=None, debug=False):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * sm_scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    monkeypatch.setattr(fa_mod, "flash_attention", plain_flash)

    Hh, Ww, nh, hd = 6, 8, 4, 8
    S = Hh * Ww
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, Hh, Ww, nh, hd), jnp.float32)
    k = jnp.asarray(rng.randn(2, S, nh, hd), jnp.float32)
    v = jnp.asarray(rng.randn(2, S, nh, hd), jnp.float32)
    Rh = jnp.asarray(rng.randn(Hh, Hh, hd), jnp.float32)
    Rw = jnp.asarray(rng.randn(Ww, Ww, hd), jnp.float32)
    scale = 1.0 / np.sqrt(hd)

    want = flash_rel_pos_attention(q, k, v, Rh, Rw, scale)

    mesh = create_mesh(2, devices=jax.devices()[:2])   # 1 dp x 2 tp
    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda *a: flash_rel_pos_attention_tp(*a, scale),
            out_shardings=jax.sharding.NamedSharding(mesh, P()))(
                q, k, v, Rh, Rw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_tp_train_step_with_flash_attention(monkeypatch):
    """End-to-end: the TP ViT train step with vit_flash_attn=True compiles
    and runs on a 2dp x 2tp mesh (the sharding.py caveat is gone). The
    global block's grid (48x48=2304 tokens) crosses the >=2048 flash gate,
    so the shard_map path is genuinely on the training graph; the Pallas
    kernel is CPU-shimmed as above."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa_mod

    def plain_flash(q, k, v, ab=None, segment_ids=None, *, causal=False,
                    sm_scale=1.0, block_sizes=None, debug=False):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * sm_scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    monkeypatch.setattr(fa_mod, "flash_attention", plain_flash)

    cfg = dataclasses.replace(
        vit_cfg(),
        backbone=dataclasses.replace(
            vit_cfg().backbone, vit_flash_attn=True))
    # 384x384 image -> 16px patches -> 24x24 grid: below the 2048 gate.
    # Widen the image to 384x1536 -> 24x96 = 2304 tokens >= 2048.
    Hv, Wv = 384, 1536
    batch = make_tp_batch()
    rng = np.random.RandomState(1)
    G = 8
    batch = dict(batch)
    batch["images"] = jnp.array(rng.randn(B, Hv, Wv, 3), jnp.float32)
    batch["img_mask"] = jnp.zeros((B, Hv, Wv), bool)
    batch["image_sizes"] = jnp.array([[Hv, Wv]] * B, jnp.int32)
    batch["targets"] = dict(batch["targets"])
    batch["targets"]["masks"] = jnp.array(
        (rng.rand(B, G, Hv // 4, Wv // 4) > 0.7).astype(np.float32))

    mesh = create_mesh(2, devices=jax.devices()[:4])   # 2 dp x 2 tp
    with jax.set_mesh(mesh):
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                                          mesh=mesh, tp=True)
        qkv = state.params["backbone"]["block_1"]["attn"]["qkv"]["kernel"]
        assert "model" in tuple(qkv.sharding.spec), qkv.sharding
        step = make_train_step(model, cfg, task="detection", mesh=mesh,
                               tp=True)
        state, metrics = step(state, jax.device_put(batch,
                                                    shard_batch(mesh)),
                              jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["total_loss"]))
