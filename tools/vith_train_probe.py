#!/usr/bin/env python
"""ViT-H flagship training feasibility on ONE v5e chip (VERDICT r3 #8).

The reference trains video_joint_vit_huge on 32 A100-80GB
(assets/TRAIN.md:3) with TWO full ViT-H towers: video_joint_vit_huge.yaml
inherits SOT.EXTRA_BACKBONE_FOR_TEMPLATE True from video_joint_r50.yaml:36
and initializes from the 4-channel model_final_4c.pth. Measured here:
that puts 1416.8M params in the train state — 5.28 GB params + 10.56 GB
f32 Adam(m,v) = 15.84 GB at INIT, i.e. the SOT step can never fit one
16 GB v5e (params+grads+m+v >= 18.5 GB even with bf16 m and zero
activations). The probe therefore maps the full frontier:

  - task=sot   : both towers (1.42B) — expected infeasible, records the
                 init-stage decomposition that proves why
  - task=vis   : stage-3 VIS leg, single shared backbone
  - task=image : stage-2 image_joint_vit_huge (single tower) — a real
                 reference training mode (image_joint_vit_huge_32g.yaml)

with two single-chip levers: adam_mu_dtype=bfloat16 (SolverConfig) and
ViT block remat (vit_use_checkpoint, reference MODEL.VIT.USE_CHECKPOINT
True in every *vit_huge yaml; on by default here).

Each arm runs in ITS OWN SUBPROCESS: XLA does not reliably return freed
buffers between arms in-process (first probe version: arm 1's init
buffers made arms 2-3 OOM during init).

Grad accumulation (solver.grad_accum_steps) is the batch-size lever and
does NOT change the memory picture (one micro-batch in flight), so the
probe runs bs=1 micro-steps: its feasibility extends to any global batch.
The multi-chip exit is the dp x sp x tp mesh the driver dryrun validates
(ViT TP shards params AND optimizer state with them).

Writes VITH_TRAIN.json; results belong in docs/PERF.md.

Usage: python tools/vith_train_probe.py \
         [--arms 480x736:f32:sot 480x736:bf16:image ...]
"""
import argparse
import json
import os
import subprocess
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK = "@@VITH@@"


def probe(res, task, mu_dtype):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from uninext_tpu.config import (image_joint_vit_huge,
                                    video_joint_vit_huge)
    from uninext_tpu.engine.train import (create_train_state,
                                          create_video_train_state,
                                          make_train_step,
                                          make_video_train_step)

    H, W = res
    cfg = (image_joint_vit_huge() if task == "image"
           else video_joint_vit_huge())
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, max_insts=20),
        solver=dataclasses.replace(
            cfg.solver,
            adam_mu_dtype="bfloat16" if mu_dtype == "bf16" else None))
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
    if task == "image":
        batch = {
            "images": jnp.array(rng.randn(B, H, W, 3), jnp.float32),
            "img_mask": jnp.zeros((B, H, W), bool),
            "image_sizes": jnp.array([[H, W]] * B, jnp.int32),
            "text_ids": jnp.array(rng.randint(0, 30000, (B, T)), jnp.int32),
            "text_mask": jnp.ones((B, T), jnp.int32),
            "targets": tgt,
        }
    else:
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
    out = {"resolution": f"{H}x{W}", "task": task, "mu_dtype": mu_dtype}
    t0 = time.time()
    if task == "image":
        model, state = create_train_state(
            cfg, jax.random.PRNGKey(0), batch, task="detection")
        step = make_train_step(model, cfg, task="detection")
    else:
        model, state = create_video_train_state(
            cfg, jax.random.PRNGKey(0), batch,
            task=("sot" if task == "sot" else "detection"), init_all=True)
        step = make_video_train_step(
            model, cfg, task=("sot" if task == "sot" else "detection"))
    out["init_seconds"] = round(time.time() - t0, 1)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    out["params_m"] = round(n_params / 1e6, 1)
    out["param_gb"] = round(4 * n_params / 2 ** 30, 2)
    opt_bytes = sum(x.size * x.dtype.itemsize
                    for x in jax.tree_util.tree_leaves(state.opt_state)
                    if hasattr(x, "dtype"))
    out["opt_state_gb"] = round(opt_bytes / 2 ** 30, 2)
    try:
        t0 = time.time()
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        total = float(metrics["total_loss"])          # sync
        out["first_step_seconds_incl_compile"] = round(time.time() - t0, 1)
        times = []
        for i in range(3):
            t0 = time.time()
            state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
            float(metrics["total_loss"])
            times.append(time.time() - t0)
        stats = jax.local_devices()[0].memory_stats() or {}
        out.update({
            "ok": True,
            "step_seconds": round(min(times), 2),
            "total_loss": round(total, 2),
            "hbm_peak_gb": round(
                stats.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
        })
    except Exception as e:
        out.update({"ok": False,
                    "error": f"{type(e).__name__}: {str(e)[:300]}"})
        traceback.print_exc()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", nargs="+",
                    default=["480x736:f32:sot", "480x736:bf16:vis",
                             "480x736:bf16:image", "480x736:f32:image"])
    ap.add_argument("--single", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--out", default=os.path.join(REPO, "VITH_TRAIN.json"))
    ap.add_argument("--merge", action="store_true",
                    help="append to probes already in --out (round 5: adds "
                         "the 800px-class arms without re-running round 4's)")
    args = ap.parse_args()

    if args.single:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        r, mu, task = args.single.split(":")
        H, W = map(int, r.split("x"))
        try:
            out = probe((H, W), task, mu)
        except Exception as e:
            out = {"resolution": r, "task": task, "mu_dtype": mu,
                   "ok": False,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
            traceback.print_exc()
        print(MARK + json.dumps(out), flush=True)
        return

    results = []
    for arm in args.arms:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", arm],
            capture_output=True, text=True, timeout=3600)
        out = None
        for line in p.stdout.splitlines():
            if line.startswith(MARK):
                out = json.loads(line[len(MARK):])
        if out is None:
            out = {"arm": arm, "ok": False,
                   "error": f"subprocess rc={p.returncode}: "
                            f"{p.stderr[-300:]}"}
        print(f"[probe] {out}", flush=True)
        results.append(out)
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f).get("probes", [])
        done = {(r.get("resolution"), r.get("task"), r.get("mu_dtype"))
                for r in results}
        results = [r for r in prev
                   if (r.get("resolution"), r.get("task"),
                       r.get("mu_dtype")) not in done] + results
    payload = {
        "probes": results,
        "reference_hardware": "32 A100-80GB (assets/TRAIN.md:3), "
                              "2 full ViT-H towers "
                              "(EXTRA_BACKBONE_FOR_TEMPLATE "
                              "video_joint_r50.yaml:36 + _4c weights)",
        "chip": "1x TPU v5e (16GB HBM)",
        "sot_infeasibility": "1416.8M params: 5.28GB params + 10.56GB f32 "
                             "Adam = 15.84GB at init; +5.28GB grads means "
                             ">18.5GB during any step, > HBM even with "
                             "bf16 m and zero activations",
        "multichip_exit": "dp x sp x tp mesh (driver dryrun): ViT TP "
                          "shards params and optimizer state together",
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
