#!/usr/bin/env python
"""Stage breakdown of the ViT-H SOT serving frame (config 5) at 800x1216.

Same in-graph fori_loop methodology as bench.py/profile_det.py:
  backbone   encode_image (ViT-H + input projections + sine pos)
  full       complete SOT frame step (template prompt cached)
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

from uninext_tpu.config import video_joint_vit_huge
from uninext_tpu.models.detr import UninextDETR, init_all_paths

N = 20


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
    print(f"{name:28s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    H, W = (int(x) for x in (sys.argv[1:3] or (800, 1216)))
    cfg = video_joint_vit_huge()
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    p = params["params"]
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(1, H, W, 3), jnp.float32)
    img_mask = jnp.zeros((1, H, W), bool)
    sizes = jnp.array([[H, W]], jnp.int32)

    from uninext_tpu.engine.sot_inference import (make_template_encoder,
                                                  make_sot_frame_step)
    encode = make_template_encoder(model, cfg)
    box = jnp.array([[200.0, 150.0, 400.0, 350.0]])
    lang = encode(p, images, box)
    step = make_sot_frame_step(model, cfg, H, W, with_mask=True)

    @jax.jit
    def loop_backbone(pp, im, msk):
        def body(i, acc):
            srcs, masks, poses = model.apply(
                {"params": pp}, im + i * 1e-9, msk, train=False,
                method=UninextDETR.encode_image)
            return acc + sum(s.astype(jnp.float32).mean() for s in srcs)
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    @jax.jit
    def loop_full(pp, im, msk, sz, lh, lm):
        def body(i, acc):
            r = step.__wrapped__(pp, im + i * 1e-9, msk, sz, lh, lm)
            return acc + r["score"].sum() + r["box_cxcywh"].sum() \
                + r["mask_logits"].mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    tb = timeit("backbone+proj+pos", loop_backbone, p, images, img_mask)
    tf = timeit("full SOT frame", loop_full, p, images, img_mask, sizes,
                lang["hidden"], lang["masks"])
    print(f"{'-> transformer+heads+mask':28s} {(tf - tb) * 1e3:8.2f} ms")
    print(f"{'frame FPS':28s} {1.0 / tf:8.2f}")


if __name__ == "__main__":
    main()
