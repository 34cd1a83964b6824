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
