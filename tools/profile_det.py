#!/usr/bin/env python
"""Stage breakdown of the detection serving frame (config 1) on one chip.

Times each stage with the same in-graph fori_loop methodology as bench.py:
  backbone   encode_image (R50 + input projections + sine pos)
  encoder    transformer encoder only (6 MSDA layers + VLFuse)
  full       complete forward (backbone+encoder+decoder+heads), prompt cached
  post       + postprocess_detection (grounding->OD, NMS, top-k)
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
from uninext_tpu.models.detr import UninextDETR, init_all_paths

N = 30


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
    float(loop(*args))
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
    print(f"{name:28s} {best * 1e3:8.2f} ms")
    return best


def main():
    H, W = 800, 1216
    cfg = image_joint_r50()
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(1, H, W, 3), jnp.float32)
    img_mask = jnp.zeros((1, H, W), bool)
    sizes = jnp.array([[H, W]], jnp.int32)
    T = 256
    tids = jnp.array(rng.randint(0, 30000, (1, T)), jnp.int32)
    tmask = jnp.ones((1, T), jnp.int32)
    cls_map = jnp.zeros((80, T), bool).at[
        jnp.arange(80), jnp.arange(80) * 2 + 1].set(True)
    lang = jax.jit(lambda p, a, b: model.apply(
        p, a, b, method=UninextDETR.encode_text))(params, tids, tmask)

    @jax.jit
    def loop_backbone(p, im, msk):
        def body(i, acc):
            srcs, masks, poses = model.apply(
                p, im + i * 1e-9, msk, train=False,
                method=UninextDETR.encode_image)
            return acc + sum(s.astype(jnp.float32).mean() for s in srcs)
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    @jax.jit
    def loop_full(p, im, msk, sz, lg):
        def body(i, acc):
            out = model.apply(p, im + i * 1e-9, msk, sz, tids, tmask,
                              task="detection", train=False, lang_dict=lg)
            return acc + out["pred_logits"].astype(jnp.float32).mean() \
                + out["pred_boxes"].mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    @jax.jit
    def loop_post(p, im, msk, sz, lg):
        from uninext_tpu.models.postprocess import postprocess_detection

        def body(i, acc):
            out = model.apply(p, im + i * 1e-9, msk, sz, tids, tmask,
                              task="detection", train=False, lang_dict=lg)
            post = postprocess_detection(
                {k: out[k] for k in ("pred_logits", "pred_boxes",
                                     "pred_boxious")}, cls_map)
            return acc + post["scores"].sum() + post["boxes"].sum()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    tb = timeit("backbone+proj+pos", loop_backbone, params, images, img_mask)
    tf = timeit("full fwd (prompt cached)", loop_full, params, images,
                img_mask, sizes, lang)
    tp = timeit("full + postprocess", loop_post, params, images, img_mask,
                sizes, lang)
    print(f"{'-> transformer (full-bb)':28s} {(tf - tb) * 1e3:8.2f} ms")
    print(f"{'-> postprocess only':28s} {(tp - tf) * 1e3:8.2f} ms")
    print(f"{'frame FPS':28s} {1.0 / tp:8.2f}")


if __name__ == "__main__":
    main()
