#!/usr/bin/env python
"""ViT-H flagship training feasibility on ONE v5e chip (VERDICT r3 #8).

The reference trains video_joint_vit_huge on 32 A100-80GB
(assets/TRAIN.md:3). One v5e has 16 GB HBM; the probe answers: does one
REAL routed stage-3 train step (2-frame video pair, reid + the 4-channel
template tower that doubles the backbone) fit and run — with encoder remat
and bf16 compute — and at what step time / HBM high-water?

Grad accumulation (solver.grad_accum_steps) is the batch-size lever and
does NOT change the memory picture (one micro-batch in flight), so the
probe runs bs=1 micro-steps: its feasibility extends to any global batch.

Writes VITH_TRAIN.json; results belong in docs/PERF.md. On OOM the probe
records the failing resolution and steps down so the report contains the
feasibility frontier rather than a stack trace.

Usage: python tools/vith_train_probe.py [--res 480x736 ...] [--task sot]
"""
import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(res, task):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uninext_tpu.config import video_joint_vit_huge
    from uninext_tpu.engine.train import (create_video_train_state,
                                          make_video_train_step)

    H, W = res
    cfg = video_joint_vit_huge()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, max_insts=20))
    B, G, T = 1, cfg.data.max_insts, 256
    rng = np.random.RandomState(0)
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    pm = np.zeros((B, G, T), bool)
    boxes[:, :3] = [0.4, 0.5, 0.2, 0.3]
    valid[:, :3] = True
    pm[:, :3, 2] = True
    tgt = {"boxes": jnp.array(boxes), "valid": jnp.array(valid),
           "positive_map": jnp.array(pm),
           "masks": jnp.array((rng.rand(B, G, H // 4, W // 4) > 0.7)
                              .astype(np.float32))}
    batch = {
        "images_key": jnp.array(rng.randn(B, H, W, 3), jnp.float32),
        "images_ref": jnp.array(rng.randn(B, H, W, 3), jnp.float32),
        "img_mask": jnp.zeros((B, H, W), bool),
        "image_sizes": jnp.array([[H, W]] * B, jnp.int32),
        "text_ids": jnp.array(rng.randint(0, 30000, (B, T)), jnp.int32),
        "text_mask": jnp.ones((B, T), jnp.int32),
        "targets_key": tgt,
        "targets_ref": jax.tree.map(lambda x: x + 0, tgt),
    }
    t0 = time.time()
    model, state = create_video_train_state(
        cfg, jax.random.PRNGKey(0), batch, task=task, init_all=True)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    init_s = time.time() - t0
    step = make_video_train_step(model, cfg, task=task)
    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    total = float(metrics["total_loss"])          # sync
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
        float(metrics["total_loss"])
        times.append(time.time() - t0)
    stats = jax.local_devices()[0].memory_stats() or {}
    return {
        "resolution": f"{H}x{W}", "task": task, "ok": True,
        "params_m": round(n_params / 1e6, 1),
        "init_seconds": round(init_s, 1),
        "first_step_seconds_incl_compile": round(compile_s, 1),
        "step_seconds": round(min(times), 2),
        "total_loss": round(total, 2),
        "hbm_peak_gb": round(stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
        "hbm_limit_gb": round(stats.get("bytes_limit", 0) / 2 ** 30, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", nargs="+", default=["480x736"])
    ap.add_argument("--task", default="sot",
                    help="sot exercises BOTH backbones (image + 4ch "
                         "template tower)")
    ap.add_argument("--out", default=os.path.join(REPO, "VITH_TRAIN.json"))
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    results = []
    for r in args.res:
        H, W = map(int, r.split("x"))
        try:
            out = probe((H, W), args.task)
        except Exception as e:
            out = {"resolution": r, "task": args.task, "ok": False,
                   "error": f"{type(e).__name__}: {str(e)[:500]}"}
            traceback.print_exc()
        print(f"[probe] {out}", flush=True)
        results.append(out)
    with open(args.out, "w") as f:
        json.dump({"probes": results,
                   "reference_hardware": "32 A100-80GB (assets/TRAIN.md:3)",
                   "chip": "1x TPU v5e (16GB HBM)"}, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
