#!/usr/bin/env python
"""Train-step breakdown on one chip (VERDICT weak #2: 1.56 s/step at
bs=2/800px). Times, each as an in-graph fori_loop (N iterations, perturbed
input, scalar readback, overhead-subtracted):

  fwd_loss    loss-only forward (model.apply train=True, all losses)
  fwd_bwd     value_and_grad of the same (the train step minus optimizer)
  full_step   grads + optimizer update (what make_train_step compiles)
  matcher     Hungarian+simOTA alone at per-step scale (7 layers x bs)
  msda_bwd    encoder-scale MSDA forward+backward alone

Inputs are generated ON DEVICE (the tunnel's host->device path can degrade
to <1 MB/s). Usage: python tools/profile_train.py [sections...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from uninext_tpu.config import image_joint_r50
from uninext_tpu.models.detr import UninextDETR

N = 10
B, H, W, T, G = 2, 800, 1216, 256, 80


def overhead():
    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((256, 256))
    float(f(x))
    s = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(x + i + 1))
        s.append(time.perf_counter() - t0)
    return min(s)


def timeit(name, loop, *args):
    ov = overhead()
    t0 = time.perf_counter()
    float(loop(*args))
    print(f"  [{name} compile+first: {time.perf_counter() - t0:.1f}s]",
          flush=True)
    best = None
    for r in range(2):
        pert = tuple(a * (1 + (r + 1) * 1e-6)
                     if isinstance(a, jnp.ndarray)
                     and jnp.issubdtype(a.dtype, jnp.floating) else a
                     for a in args)
        t0 = time.perf_counter()
        float(loop(*pert))
        dt = (time.perf_counter() - t0 - ov) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best * 1e3:8.1f} ms", flush=True)
    return best


@jax.jit
def make_batch(key):
    ks = jax.random.split(key, 4)
    boxes = jnp.concatenate([
        jax.random.uniform(ks[0], (B, G, 2), minval=0.3, maxval=0.7),
        jax.random.uniform(ks[1], (B, G, 2), minval=0.1, maxval=0.25)], -1)
    valid = (jnp.arange(G)[None] < 12).astype(bool) * jnp.ones((B, 1), bool)
    pm = jax.nn.one_hot(
        jax.random.randint(ks[2], (B, G), 1, 40), T, dtype=jnp.bool_)
    masks = (jax.random.uniform(ks[3], (B, G, H // 4, W // 4)) > 0.9
             ).astype(jnp.float32)
    return {
        "images": jax.random.normal(ks[0], (B, H, W, 3), jnp.float32),
        "img_mask": jnp.zeros((B, H, W), bool),
        "image_sizes": jnp.array([[H, W]] * B, jnp.int32),
        "text_ids": jax.random.randint(ks[1], (B, T), 0, 30000),
        "text_mask": jnp.ones((B, T), jnp.int32),
        "targets": {"boxes": boxes, "valid": valid, "positive_map": pm,
                    "masks": masks},
    }


def main(sections):
    every = not sections
    cfg = image_joint_r50()
    model = UninextDETR(cfg)
    batch = make_batch(jax.random.PRNGKey(0))
    jax.block_until_ready(batch)
    print(f"bs={B} {H}x{W}", flush=True)

    from uninext_tpu.engine.train import (create_train_state, loss_weights,
                                          make_train_step, weighted_total)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    weights = loss_weights(cfg)
    tgt = dict(batch["targets"], has_masks=True)

    def loss_fn(params, b):
        losses = model.apply(
            {"params": params}, b["images"], b["img_mask"], b["image_sizes"],
            b["text_ids"], b["text_mask"], task="detection",
            targets=dict(b["targets"], has_masks=True), train=True,
            rngs={"dn": jax.random.PRNGKey(7)})
        return weighted_total(losses, weights)

    if every or "fwd_loss" in sections:
        @jax.jit
        def loop_fwd(p, b):
            def body(i, acc):
                bb = dict(b, images=b["images"] + i * 1e-9)
                return acc + loss_fn(p, bb)
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))
        timeit("fwd_loss", loop_fwd, state.params, batch)

    if every or "fwd_bwd" in sections:
        @jax.jit
        def loop_bwd(p, b):
            def body(i, acc):
                bb = dict(b, images=b["images"] + i * 1e-9)
                l, g = jax.value_and_grad(loss_fn)(p, bb)
                return acc + l + jax.tree.reduce(
                    lambda a, x: a + x.sum().astype(jnp.float32), g,
                    jnp.float32(0))
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))
        timeit("fwd_bwd", loop_bwd, state.params, batch)

    if every or "full_step" in sections:
        step = make_train_step(model, cfg, task="detection")
        # real step (donated state): time N sequential dispatches
        s = state
        s, m = step(s, batch, jax.random.PRNGKey(1))
        float(m["total_loss"])
        t0 = time.perf_counter()
        for i in range(N):
            s, m = step(s, batch, jax.random.PRNGKey(i))
        float(m["total_loss"])
        print(f"{'full_step':28s} {(time.perf_counter() - t0) / N * 1e3:8.1f}"
              " ms", flush=True)

    if every or "matcher" in sections:
        from uninext_tpu.models.matcher import hungarian_match
        L = 7
        key = jax.random.PRNGKey(3)
        cost = jax.random.normal(key, (L * B, 900, G))
        gt_valid = jnp.tile((jnp.arange(G) < 12)[None], (L * B, 1))

        @jax.jit
        def loop_match(c):
            def body(i, acc):
                idx = jax.vmap(hungarian_match)(c + i * 1e-6, gt_valid)
                return acc + idx.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))
        timeit("matcher(7LxB hungarian)", loop_match, cost)

    if every or "msda_bwd" in sections:
        from uninext_tpu.ops.msda import ms_deform_attn
        SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))
        S = sum(h * w for h, w in SHAPES)

        @jax.jit
        def gen(key):
            ks = jax.random.split(key, 3)
            v = jax.random.normal(ks[0], (B, S, 8, 32), jnp.float32)
            loc = jax.random.uniform(ks[1], (B, S, 8, 4, 4, 2))
            att = jax.random.uniform(ks[2], (B, S, 8, 4, 4))
            return v, loc, att / att.sum((-1, -2), keepdims=True)
        v, loc, att = gen(jax.random.PRNGKey(4))
        jax.block_until_ready(v)

        @jax.jit
        def loop_mb(v, loc, att):
            def body(i, acc):
                def f(v, loc, att):
                    return ms_deform_attn(v, SHAPES, loc + i * 1e-7,
                                          att).sum()
                l, g = jax.value_and_grad(f, argnums=(0, 1, 2))(v, loc, att)
                return acc + l + g[0].sum() + g[1].sum() + g[2].sum()
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))
        timeit("msda fwd+bwd (enc scale)", loop_mb, v, loc, att)


if __name__ == "__main__":
    main(sys.argv[1:])
