#!/usr/bin/env python
"""ConvNeXt exercised end-to-end (VERDICT r3 #4): train-to-metric + serving.

Two legs, both recorded in CONVNEXT_RESULT.json (bench.py aggregate):

  train    a ConvNeXt-backboned model (tiny dims, the same block/stem/out-
           norm topology as ConvNeXt-Large) trains on the real-format
           mini-coco to a det AP through the full production path
           (files -> mapper -> loader -> Trainer -> DetectionEvaluator)
  serve    the REAL image_joint_convnext_large preset (reference
           configs/*convnext*: depths 3/3/27/3, dims 192/384/768/1536,
           d2 out res3-5) measured at 800x1216 bs=1 with the bench.py
           in-graph methodology

Parity for the backbone itself is pinned by tests/test_convnext_parity.py
(torch-mirror vs the reference D2ConvNeXt topology through
engine/convert.py convert_convnext).

Usage: python tools/convnext_check.py [--steps 400] [--device cpu|tpu]
       [--skip-serve] [--skip-train]
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


def tiny_convnext_cfg(steps: int):
    from uninext_tpu.config import BackboneConfig, tiny_test_config
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        backbone=BackboneConfig(name="convnext_large",
                                convnext_depths=(2, 2, 4, 2),
                                convnext_dims=(32, 64, 96, 128),
                                out_channels=(64, 96, 128),
                                drop_path_rate=0.0),
        data=dataclasses.replace(
            cfg.data, max_insts=8, max_text_len=32,
            min_size_train=(192,), max_size_train=256,
            min_size_test=192, max_size_test=256),
        solver=dataclasses.replace(
            cfg.solver, base_lr=3e-4, lang_lr=3e-4, vl_lr=3e-4,
            backbone_multiplier=1.0, warmup_iters=40, grad_clip=1.0,
            max_iter=steps, checkpoint_period=10 ** 9,
            steps=(int(steps * 0.8),)))
    return cfg


def leg_train(steps: int):
    import jax

    from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_coco
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.evaluator import DetectionEvaluator
    from uninext_tpu.engine.trainer import Trainer

    root = tempfile.mkdtemp(prefix="convnext_coco_")
    paths = make_mini_coco(root, seed=7)
    train, cats = load_coco_json(paths["train_json"], paths["train_root"])
    val, _ = load_coco_json(paths["val_json"], paths["val_root"])
    cfg = tiny_convnext_cfg(steps)
    tok = BertTokenizer()
    mapper = UniDatasetMapper(cfg.data, cats, tok, is_train=True,
                              with_masks=True)
    loader = MultiDatasetLoader([(train, mapper, 2)], [1.0], seed=0,
                                num_workers=2)
    t0 = time.time()
    tr = Trainer(cfg, iter(loader),
                 output_dir=tempfile.mkdtemp(prefix="convnext_out_"),
                 task="detection", has_masks=True, use_mesh=False,
                 log_period=100)
    tr.train()
    secs = time.time() - t0
    eval_mapper = UniDatasetMapper(cfg.data, cats, tok, is_train=False,
                                   with_masks=True)
    _, _, cmap = create_label_token_map(cats, tok, cfg.data.max_text_len)
    det = DetectionEvaluator(tr.model, cfg, cmap, with_masks=False).evaluate(
        tr.state.params, val, eval_mapper, score_thr=0.05)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(tr.state.params))
    print(f"[train] ConvNeXt det AP {det['AP']:.3f} in {secs:.0f}s "
          f"({n_params / 1e6:.1f}M params)", flush=True)
    return {"steps": steps, "train_seconds": round(secs, 1),
            "det_ap": round(float(det["AP"]), 4),
            "params_m": round(n_params / 1e6, 1),
            "backbone": "convnext (tiny dims, large topology)"}


def leg_serve():
    """image_joint_convnext_large serving FPS, bench.py methodology."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uninext_tpu.config import image_joint_convnext_large
    from uninext_tpu.models.detr import UninextDETR, init_all_paths
    from uninext_tpu.models.postprocess import postprocess_detection

    N = 20
    H, W, T = 800, 1216, 256
    cfg = image_joint_convnext_large()
    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    rng = np.random.RandomState(0)
    images = jnp.array(rng.randn(1, H, W, 3), jnp.float32)
    img_mask = jnp.zeros((1, H, W), bool)
    sizes = jnp.array([[H, W]], jnp.int32)
    tids = jnp.array(rng.randint(0, 30000, (1, T)), jnp.int32)
    tmask = jnp.ones((1, T), jnp.int32)
    cmap = jnp.zeros((80, T), bool).at[
        jnp.arange(80), jnp.arange(80) * 2 + 1].set(True)
    lang = jax.jit(lambda p, a, b: model.apply(
        p, a, b, method=UninextDETR.encode_text))(params, tids, tmask)

    trivial = jax.jit(lambda x: x.sum())
    x = jnp.ones((256, 256))
    float(trivial(x))
    ovs = []
    for i in range(5):
        t0 = time.perf_counter()
        float(trivial(x + i + 1))
        ovs.append(time.perf_counter() - t0)
    ov = min(ovs)

    @jax.jit
    def loop(p, im, msk, sz, lg):
        def body(i, acc):
            out = model.apply(p, im + i * 1e-9, msk, sz, tids, tmask,
                              task="detection", train=False, lang_dict=lg)
            post = postprocess_detection(
                {k: out[k] for k in ("pred_logits", "pred_boxes",
                                     "pred_boxious")}, cmap)
            return acc + post["scores"].sum() + post["boxes"].sum()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    float(loop(params, images, img_mask, sizes, lang))     # compile
    best = None
    for r in range(2):
        t0 = time.perf_counter()
        float(loop(params, images * (1 + (r + 1) * 1e-6), img_mask, sizes,
                   lang))
        dt = (time.perf_counter() - t0 - ov) / N
        best = dt if best is None else min(best, dt)
    fps = 1.0 / best
    print(f"[serve] image_joint_convnext_large ({n_params / 1e6:.1f}M) "
          f"800x1216 bs=1: {fps:.2f} FPS", flush=True)
    return {"config": "image_joint_convnext_large",
            "params_m": round(n_params / 1e6, 1),
            "fps_per_chip_800px_bs1": round(fps, 2),
            "resolution": "800x1216"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--device", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--skip-serve", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "CONVNEXT_RESULT.json"))
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".xla_cache" if args.device == "tpu"
                                   else ".xla_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    payload = {}
    if not args.skip_train:
        payload["train"] = leg_train(args.steps)
    if not args.skip_serve:
        payload["serve"] = leg_serve()
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
