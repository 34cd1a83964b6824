#!/usr/bin/env python
"""Training-quality A/B for the two documented divergences (PERF.md).

1. Static-DN layout (groups=5 x pad=20) vs NO denoising at all: the
   reference adapts group count to `100/max_gt` per batch
   (ddetrs_dn.py:594); ours fixes the layout for one compiled executable.
   If our static DN still beats no-DN on a fixed-seed real-data run, the
   static layout is doing its job (faster convergence is DN's entire
   claim).
2. Deterministic reid aux weighting vs no aux term: the reference samples
   ~10x negatives per positive stochastically (ddetrs_vid.py reid
   sampling); ours folds the same ratio into a deterministic per-row
   weight — the EXPECTATION of the reference's estimator. The A/B bounds
   the term's influence on the contrastive objective's convergence.

Runs fixed-seed mini-coco (real-format files; tools/real_ap_check.py
pipeline) and appends a results table to docs/PERF.md.

Usage: python tools/ab_divergence.py [--det-steps 250] [--vid-steps 100]
"""
import argparse
import dataclasses
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def det_run(steps: int, dn: bool, paths, seed=0):
    """Fixed-seed detection training; returns sampled loss curve + val AP."""
    import jax
    import numpy as np
    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.evaluator import DetectionEvaluator
    from uninext_tpu.engine.train import create_train_state, make_train_step
    from tools.real_ap_check import build_cfg

    cfg = build_cfg(steps)
    if not dn:
        cfg = dataclasses.replace(cfg, transformer=dataclasses.replace(
            cfg.transformer, dn_number=0))
    recs, cats = load_coco_json(paths["train_json"], paths["train_root"])
    val_recs, _ = load_coco_json(paths["val_json"], paths["val_root"])
    tok = BertTokenizer()
    mapper = UniDatasetMapper(cfg.data, cats, tok, is_train=True,
                              with_masks=True, lsj=True, lsj_size=224,
                              lsj_min_scale=0.6, lsj_max_scale=1.4)
    loader = MultiDatasetLoader([(recs, mapper, 2)], [1.0], seed=seed,
                                num_workers=2)
    it = iter(loader)
    first = jax.tree.map(lambda x: jax.numpy.asarray(x), next(it))
    model, state = create_train_state(cfg, jax.random.PRNGKey(seed), first)
    step = make_train_step(model, cfg, "detection")
    curve = []
    rng = jax.random.PRNGKey(1234)
    batch = first
    for i in range(steps):
        rng, sr = jax.random.split(rng)
        state, metrics = step(state, batch, sr)
        if i % 25 == 0 or i == steps - 1:
            curve.append((i, round(float(metrics["total_loss"]), 3)))
        batch = jax.tree.map(lambda x: jax.numpy.asarray(x), next(it))
    eval_mapper = UniDatasetMapper(cfg.data, cats, tok, is_train=False,
                                   with_masks=False)
    _, _, cmap = create_label_token_map(cats, tok, cfg.data.max_text_len)
    ev = DetectionEvaluator(model, cfg, cmap, with_masks=False)
    res = ev.evaluate(state.params, val_recs, eval_mapper, score_thr=0.05)
    ap = None if not np.isfinite(res["AP"]) else round(float(res["AP"]), 4)
    return {"curve": curve, "val_ap": ap}


def video_run(steps: int, aux_weight: float, paths, seed=0):
    """Fixed-seed 2-frame video training (pseudo-video pairs from stills);
    returns reid/contrast loss trajectories."""
    import random

    import jax
    import jax.numpy as jnp
    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.data.video import (VideoPairMapper, collate_video,
                                        pseudo_video_from_image)
    from uninext_tpu.engine.train import (create_video_train_state,
                                          make_video_train_step)
    from tools.real_ap_check import build_cfg

    cfg = build_cfg(steps)
    cfg = dataclasses.replace(
        cfg, use_reid=True,
        loss=dataclasses.replace(cfg.loss, reid_weight=2.0))
    recs, cats = load_coco_json(paths["train_json"], paths["train_root"])
    vids = [pseudo_video_from_image(r, 2) for r in recs]
    tok = BertTokenizer()
    mapper = VideoPairMapper(
        dataclasses.replace(cfg.data, min_size_train=(224,),
                            max_size_train=224),
        cats, tok, is_train=True, with_masks=True)

    rng_py = random.Random(seed)

    def batch_iter():
        while True:
            pair = [mapper(vids[rng_py.randrange(len(vids))],
                           random.Random(rng_py.getrandbits(32)))
                    for _ in range(2)]
            if all(p[0].bucket == pair[0][0].bucket for p in pair):
                yield jax.tree.map(jnp.asarray, collate_video(pair))

    it = batch_iter()
    first = next(it)
    model, state = create_video_train_state(cfg, jax.random.PRNGKey(seed),
                                            first)
    step = make_video_train_step(model, cfg)

    # aux-weight override: scale loss_reid_aux's contribution
    from uninext_tpu.engine import train as train_mod
    weights = train_mod.loss_weights(cfg)
    weights["loss_reid_aux"] = aux_weight

    def step2(state, batch, rng):
        def tgt(t):
            return {**t, "has_masks": True}

        def loss_fn(params):
            losses = model.apply(
                {"params": params}, batch["images_key"], batch["img_mask"],
                batch["image_sizes"], batch["text_ids"],
                batch["text_mask"], tgt(batch["targets_key"]),
                tgt(batch["targets_ref"]), batch["images_ref"],
                rngs={"dn": rng},
                method=type(model).forward_video_train)
            return train_mod.weighted_total(losses, weights), losses

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), {"total_loss": total, **losses}

    jstep = jax.jit(step2, donate_argnums=0)
    curve = []
    rng = jax.random.PRNGKey(99)
    batch = first
    for i in range(steps):
        rng, sr = jax.random.split(rng)
        state, m = jstep(state, batch, sr)
        if i % 10 == 0 or i == steps - 1:
            curve.append((i, round(float(m["loss_reid"]), 4),
                          round(float(m.get("loss_reid_aux", 0.0)), 4)))
        batch = next(it)
    return {"curve": curve}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det-steps", type=int, default=250)
    ap.add_argument("--vid-steps", type=int, default=100)
    ap.add_argument("--skip-det", action="store_true")
    ap.add_argument("--skip-vid", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "ABRESULT.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".xla_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from uninext_tpu.data.mini_coco import make_mini_coco
    root = tempfile.mkdtemp(prefix="ab_mini_coco_")
    paths = make_mini_coco(root, seed=5)

    out = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    if not args.skip_det:
        print("[A/B] static-DN vs no-DN ...")
        out["dn_on"] = det_run(args.det_steps, True, paths)
        print("  dn_on:", out["dn_on"])
        out["dn_off"] = det_run(args.det_steps, False, paths)
        print("  dn_off:", out["dn_off"])

    if not args.skip_vid:
        print("[A/B] deterministic reid aux vs none ...")
        out["reid_aux_on"] = video_run(args.vid_steps, 2.0, paths)
        print("  aux_on:", out["reid_aux_on"]["curve"][-3:])
        out["reid_aux_off"] = video_run(args.vid_steps, 0.0, paths)
        print("  aux_off:", out["reid_aux_off"]["curve"][-3:])

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
