#!/usr/bin/env python
"""Batched-serving throughput of the detection config on one chip.

The reference serves detection strictly at bs=1 (its test loader hardwires
batch_size=1, detectron2 data/build.py:219-263), so its per-chip throughput
IS its per-frame latency. Our serving path is batch-general end to end
(model apply + postprocess_detection are (B, ...) throughout), so one chip
can trade latency for throughput. This tool measures effective img/s at
bs in {1, 2, 4, 8} with bench.py's in-graph fori_loop methodology and
writes a table for docs/PERF.md.

Expectation going in: the MSDA gather-emitter cost (docs/PERF.md round-3/4
accounting: ~50 of 63 ms/frame) scales linearly with batch rows, so the
win is bounded by the amortizable residue (dispatch, host sync, fixed
overheads). Measuring it anyway pins the production throughput story.

Usage: python tools/serve_throughput.py [--sizes 1 2 4 8] [--hw 800 1216]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--hw", nargs=2, type=int, default=[800, 1216])
    args = ap.parse_args()
    H, W = args.hw

    from uninext_tpu.config import image_joint_r50
    from uninext_tpu.models.detr import UninextDETR, init_all_paths
    from uninext_tpu.models.postprocess import postprocess_detection

    cfg = image_joint_r50()
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    T = 256
    cls_map = jnp.zeros((80, T), bool).at[
        jnp.arange(80), jnp.arange(80) * 2 + 1].set(True)

    rows = []
    for B in args.sizes:
        images = jnp.array(rng.randn(B, H, W, 3), jnp.float32)
        img_mask = jnp.zeros((B, H, W), bool)
        sizes = jnp.tile(jnp.array([[H, W]], jnp.int32), (B, 1))
        tids = jnp.array(rng.randint(0, 30000, (B, T)), jnp.int32)
        tmask = jnp.ones((B, T), jnp.int32)
        lang = jax.jit(lambda p, a, b: model.apply(
            p, a, b, method=UninextDETR.encode_text))(params, tids, tmask)

        @jax.jit
        def loop(p, im, msk, sz, lg):
            def body(i, acc):
                out = model.apply(p, im + i * 1e-9, msk, sz, tids, tmask,
                                  task="detection", train=False,
                                  lang_dict=lg)
                post = postprocess_detection(
                    {k: out[k] for k in ("pred_logits", "pred_boxes",
                                         "pred_boxious")}, cls_map)
                return acc + post["scores"].sum() + post["boxes"].sum()
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))

        ov = overhead()
        t0 = time.time()
        float(loop(params, images, img_mask, sizes, lang))  # compile+warm
        compile_s = time.time() - t0
        best = None
        for r in range(3):
            pert = images * (1 + (r + 1) * 1e-6)
            t0 = time.perf_counter()
            float(loop(params, pert, img_mask, sizes, lang))
            dt = (time.perf_counter() - t0 - ov) / N
            best = dt if best is None else min(best, dt)
        row = {"bs": B, "step_ms": round(best * 1e3, 2),
               "img_per_s": round(B / best, 2),
               "ms_per_img": round(best * 1e3 / B, 2),
               "compile_s": round(compile_s, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["img_per_s"]
    out = {"config": "image_joint_r50", "resolution": f"{H}x{W}",
           "device": jax.devices()[0].device_kind, "rows": rows,
           "throughput_gain_at_max_bs": round(
               rows[-1]["img_per_s"] / base, 3)}
    path = os.path.join(REPO, "THROUGHPUT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[done] wrote {path}")


if __name__ == "__main__":
    main()
