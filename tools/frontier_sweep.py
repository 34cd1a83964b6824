#!/usr/bin/env python
"""Eval-protocol accuracy <-> throughput frontier for the image configs
(VERDICT r4 #1 — the round-5 headline task).

Rounds 2-4 exhausted the op-level offensive on the 800px image-config frame
(docs/PERF.md accounts it to the XLA gather-emitter floor at FIXED
protocol). This tool moves up a level: the SAME trained weights legally
serve under cheaper eval protocols —

  * query count: two-stage top-k is an eval knob (reference single-task
    configs ship 300 vs the joint models' 900; uninext/config.py:160)
  * sampling points: DEC_N_POINTS/ENC_N_POINTS (uninext/config.py:163-164)
  * eval resolution: MIN_SIZE_TEST (800 image default)

via engine/protocol.py param surgery. Two paired measurements per protocol:

  AP  — train the flagship image_joint_r50 preset ONCE on mini-coco, then
        evaluate the SAME checkpoint under every protocol (paired deltas:
        no seed noise, the eval is deterministic given the checkpoint).
        Resolution knobs scale mini-coco's 224px eval by the same fractions
        as the 800px serving points.
  FPS — bench.py's in-graph serving loop at the REAL serving shapes
        (800/736/672/608 shortest side) with protocol-adapted params.

Output: FRONTIER.json at the repo root + a markdown table for docs/PERF.md.

Usage:
  python tools/frontier_sweep.py --device tpu --steps 2000     # full
  python tools/frontier_sweep.py --device cpu --mode ap --steps 60  # smoke
"""
import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, num_queries, enc_points, dec_points, res_scale)
# res_scale multiplies the serving shortest side (800 -> 736/672/608) and
# the fixture eval size (224 -> 208/192/176, rounded to /16).
PROTOCOLS = [
    ("base_900q_p44_800px",   900, 4, 4, 1.00),
    ("res736",                900, 4, 4, 0.92),
    ("res672",                900, 4, 4, 0.84),
    ("res608",                900, 4, 4, 0.76),
    ("q600",                  600, 4, 4, 1.00),
    ("q300",                  300, 4, 4, 1.00),
    ("dec2",                  900, 4, 2, 1.00),
    ("enc2",                  900, 2, 4, 1.00),
    ("enc2_dec2",             900, 2, 2, 1.00),
    ("q300_res672",           300, 4, 4, 0.84),
    ("q300_res608",           300, 4, 4, 0.76),
    ("q300_p22",              300, 2, 2, 1.00),
    ("q300_p22_res672",       300, 2, 2, 0.84),
    ("q300_p22_res608",       300, 2, 2, 0.76),
]


def serving_shape(scale: float):
    """800x1216 worst-case bucket scaled, rounded up to /32."""
    def r32(x):
        return int(-(-x // 32) * 32)
    return r32(800 * scale), r32(1216 * scale)


def fixture_res(scale: float):
    def r16(x):
        return int(-(-x // 16) * 16)
    return r16(224 * scale), r16(352 * scale)


def run_ap(args, results):
    import jax
    import numpy as np

    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_coco
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.evaluator import DetectionEvaluator
    from uninext_tpu.engine.protocol import adapt_params
    from uninext_tpu.engine.trainer import Trainer
    from uninext_tpu.models.detr import UninextDETR

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from real_ap_check import build_cfg

    root = args.data_root or tempfile.mkdtemp(prefix="mini_coco_frontier_")
    from uninext_tpu.data.mini_coco import make_mini_coco
    paths = make_mini_coco(root, n_train=args.n_train, n_val=args.n_val)
    cfg = build_cfg(args.steps, flagship=not args.smoke)
    train_recs, cats = load_coco_json(paths["train_json"],
                                      paths["train_root"])
    val_recs, _ = load_coco_json(paths["val_json"], paths["val_root"])
    tok = BertTokenizer()
    train_mapper = UniDatasetMapper(cfg.data, cats, tok, is_train=True,
                                    with_masks=True, lsj=True, lsj_size=224,
                                    lsj_min_scale=0.6, lsj_max_scale=1.4)
    loader = MultiDatasetLoader([(train_recs, train_mapper, 2)], [1.0],
                                seed=0, num_workers=2)
    out_dir = tempfile.mkdtemp(prefix="frontier_out_")
    t0 = time.time()
    trainer = Trainer(cfg, iter(loader), output_dir=out_dir,
                      task="detection", has_masks=True, use_mesh=False,
                      log_period=100)
    trainer.train()
    print(f"[train] flagship {args.steps} steps in {time.time()-t0:.0f}s",
          flush=True)
    params = jax.tree.map(np.asarray, trainer.state.params)
    del trainer

    _, _, cmap = create_label_token_map(cats, tok, cfg.data.max_text_len)
    for (name, q, ep, dp, scale) in PROTOCOLS:
        h, w = fixture_res(scale)
        cfg_p = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, min_size_test=h,
                                          max_size_test=w))
        p2, cfg_p = adapt_params({"params": params}, cfg_p,
                                 num_queries=q, enc_n_points=ep,
                                 dec_n_points=dp)
        model2 = UninextDETR(cfg_p)
        eval_mapper = UniDatasetMapper(cfg_p.data, cats, tok, is_train=False,
                                       with_masks=True)
        t0 = time.time()
        ev = DetectionEvaluator(model2, cfg_p, cmap, with_masks=False)
        res = ev.evaluate(p2["params"], val_recs, eval_mapper,
                          score_thr=0.05)
        ap = None if not np.isfinite(res["AP"]) else round(float(res["AP"]), 4)
        entry = results.setdefault(name, {
            "num_queries": q, "enc_points": ep, "dec_points": dp,
            "res_scale": scale})
        entry["ap_bbox"] = ap
        entry["ap50_bbox"] = (None if not np.isfinite(res["AP50"])
                              else round(float(res["AP50"]), 4))
        entry["fixture_eval_res"] = [h, w]
        print(f"[ap] {name}: AP={ap} AP50={entry['ap50_bbox']} "
              f"({time.time()-t0:.0f}s)", flush=True)
        save(args, results, partial=True)

    # segm AP (instseg parity) for base + the would-be promoted point only
    # (a full segm sweep doubles eval cost for little information)
    save(args, results, partial=True)
    with open(args.out) as f:
        prom = json.load(f).get("promoted")
    segm_targets = ["base_900q_p44_800px"] + ([prom["name"]] if prom else [])
    for name in segm_targets:
        q, ep, dp, scale = next(
            (pq, pe, pd, ps) for (pn, pq, pe, pd, ps) in PROTOCOLS
            if pn == name)
        h, w = fixture_res(scale)
        cfg_p = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, min_size_test=h,
                                          max_size_test=w))
        p2, cfg_p = adapt_params({"params": params}, cfg_p, num_queries=q,
                                 enc_n_points=ep, dec_n_points=dp)
        model2 = UninextDETR(cfg_p)
        eval_mapper = UniDatasetMapper(cfg_p.data, cats, tok,
                                       is_train=False, with_masks=True)
        ev = DetectionEvaluator(model2, cfg_p, cmap, with_masks=True)
        res = ev.evaluate(p2["params"], val_recs, eval_mapper,
                          score_thr=0.05)
        results[name]["ap_segm"] = (
            None if not np.isfinite(res["AP"]) else round(float(res["AP"]),
                                                          4))
        print(f"[ap-segm] {name}: {results[name]['ap_segm']}", flush=True)
        save(args, results, partial=True)


def _walltime(loop, n, args_):
    """One synchronous wall-clock sample of loop(n, *args_)."""
    t0 = time.time()
    float(loop(n, *args_))
    return time.time() - t0


def run_fps(args, results):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uninext_tpu.config import image_joint_r50
    from uninext_tpu.engine.protocol import adapt_params
    from uninext_tpu.models.detr import UninextDETR, init_all_paths
    from uninext_tpu.models.postprocess import postprocess_detection

    sys.path.insert(0, REPO)
    import bench
    # bench.py starts its backend watchdog at IMPORT; it is disarmed by
    # bench.main() which we never call — disarm it here or it os._exits
    # this process 45 min in (learned the hard way: first frontier run
    # died at the first FPS point with rc=3)
    bench._backend_ok.set()

    cfg = image_joint_r50()
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    base_fps = None
    for (name, q, ep, dp, scale) in PROTOCOLS:
        H, W = serving_shape(scale)
        p2, cfg2 = adapt_params(params, cfg, num_queries=q,
                                enc_n_points=ep, dec_n_points=dp)
        model2 = UninextDETR(cfg2)
        images, img_mask, sizes = bench._image_inputs(H, W)
        text_ids, text_mask, cls_token_map = bench._prompt()
        lang = jax.jit(lambda p, tid, tmsk: model2.apply(
            p, tid, tmsk, method=UninextDETR.encode_text))(
                p2, text_ids, text_mask)

        @jax.jit
        def loop(n, p, im, msk, sz, tid, tmsk, lg, model2=model2,
                 cls_token_map=cls_token_map):
            def body(i, acc):
                out = model2.apply(p, im + i * 1e-9, msk, sz, tid, tmsk,
                                   task="detection", train=False,
                                   lang_dict=lg)
                post = postprocess_detection(
                    {k: out[k] for k in ("pred_logits", "pred_boxes",
                                         "pred_boxious")}, cls_token_map)
                return acc + post["scores"].sum() + post["boxes"].sum()
            # TRACED trip count: one compile serves both measurement points
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        # Two-point fit (round-5 lesson): today's tunnel adds seconds of
        # PER-CALL overhead that varies minute to minute — bench.py's
        # subtract-one-overhead-sample scheme mismeasured the base protocol
        # by 5x (2.86 "FPS" vs the 15.96 this very graph benched in r4).
        # wall(N) = a + N*t with a unknown and noisy, so measure N1 and N2
        # several times, take min over reps (a is additive-positive), and
        # difference: t = (min wall(N2) - min wall(N1)) / (N2 - N1).
        # N2=310 + 5 interleaved reps: tunnel stalls CLUSTER in time (the
        # first pass measured 2.65 "FPS" at 736px between 12.9 at 800 and
        # 22.3 at 672 — every N2 sample of that window hit a stall), so
        # make the compute term large relative to a stall and spread
        # samples across a wider window; min-over-reps then differences.
        N1, N2, REPS = 10, 310, 5
        args_ = (p2, images, img_mask, sizes, text_ids, text_mask, lang)
        float(loop(N1, *args_))                      # compile + warm
        w1s, w2s = [], []
        for _ in range(REPS):
            w1s.append(_walltime(loop, N1, args_))
            w2s.append(_walltime(loop, N2, args_))
        dt = max((min(w2s) - min(w1s)) / (N2 - N1), 1e-9)
        fps = 1.0 / dt
        if name.startswith("base"):
            base_fps = fps
        entry = results.setdefault(name, {
            "num_queries": q, "enc_points": ep, "dec_points": dp,
            "res_scale": scale})
        entry["fps_det"] = round(fps, 3)
        entry["serving_shape"] = [H, W]
        entry["vs_reference_baseline"] = round(fps / 20.0, 3)
        if base_fps:
            entry["speedup_vs_base_protocol"] = round(fps / base_fps, 3)
        print(f"[fps] {name} @{H}x{W}: {fps:.2f} FPS "
              f"({fps/20.0:.2f}x ref baseline)", flush=True)
        save(args, results, partial=True)


def save(args, results, partial=False):
    base = results.get("base_900q_p44_800px", {})
    payload = {
        "description": "eval-protocol accuracy<->throughput frontier "
                       "(VERDICT r4 #1): paired AP deltas on one trained "
                       "flagship mini-coco checkpoint x serving FPS at "
                       "real 800px-class shapes",
        "reference_anchor": "NUM_OBJECT_QUERIES uninext/config.py:160 "
                            "(single-task=300), DEC/ENC_N_POINTS :163-164, "
                            "MIN_SIZE_TEST detectron2 defaults",
        "train_steps": args.steps, "n_train": args.n_train,
        "n_val": args.n_val, "device": args.device,
        "partial": partial,
        "protocols": results,
    }
    if base.get("ap_bbox") is not None:
        for v in results.values():
            if v.get("ap_bbox") is not None:
                v["ap_delta_vs_base"] = round(
                    v["ap_bbox"] - base["ap_bbox"], 4)
    # promote the best AP-parity point: fastest protocol whose paired AP
    # delta on the fixture is within noise (>= -0.015 absolute; the val
    # set is 48 images so one borderline detection moves AP ~0.01)
    cands = [(k, v) for k, v in results.items()
             if v.get("fps_det") and v.get("ap_delta_vs_base") is not None
             and v["ap_delta_vs_base"] >= -0.015]
    if cands:
        k, v = max(cands, key=lambda kv: kv[1]["fps_det"])
        payload["promoted"] = {"name": k, **v}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--mode", default="both", choices=["ap", "fps", "both"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n-train", type=int, default=32)
    ap.add_argument("--n-val", type=int, default=48)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out", default=os.path.join(REPO, "FRONTIER.json"))
    ap.add_argument("--smoke", action="store_true",
                    help="plumbing check: tiny preset (60 queries), reduced "
                         "protocol list — numbers are NOT evidence")
    args = ap.parse_args()
    if args.smoke:
        global PROTOCOLS
        PROTOCOLS = [
            ("base_900q_p44_800px", 60, 4, 4, 1.00),
            ("q300", 40, 4, 4, 1.00),
            ("q300_p22_res608", 40, 2, 2, 0.76),
        ]

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".xla_cache" if args.device == "tpu"
                                   else ".xla_cache_cpu-frontier"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    results = {}
    if args.mode in ("fps", "both"):
        run_fps(args, results)
    if args.mode in ("ap", "both"):
        run_ap(args, results)
    save(args, results)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
