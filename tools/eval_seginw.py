#!/usr/bin/env python
"""Segmentation-in-the-Wild (SegInW) zero-shot evaluation sweep.

The reference was SegInW runner-up (README.md:22-23): the image_joint model
is evaluated ZERO-SHOT on 25 in-the-wild instance-segmentation datasets —
no fine-tuning, each dataset's own category names become the text prompt
(detection-as-grounding), and the headline number is the mean mask AP over
the 25 (reference registration: data/datasets/seginw.py; ours:
data/registry.py `seginw_<Subset>_val`).

This tool runs that sweep over whatever subsets exist under $UNINEXT_DATA
(all 25 when the real data is mounted; `--make-mini` generates a 2-subset
fixture for demonstration), scoring each with the DetectionEvaluator
(C++ cocoeval, segm + bbox) using the subset's own categories, and reports
per-dataset AP plus the mean.

Usage:
  UNINEXT_DATA=/data python tools/eval_seginw.py --resume-dir out/ \
      [--subsets Chicken Cows] [--device cpu|tpu] [--out SEGINW_RESULT.json]
  python tools/eval_seginw.py --make-mini --steps 0   # fixture demo
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_seginw(model, params, cfg, subsets, verbose=True):
    """Zero-shot sweep: per-subset bbox/segm AP with the subset's OWN
    category names as the prompt, plus the mean over subsets (the SegInW
    headline metric). Subsets whose data is missing on disk are skipped
    and reported."""
    import numpy as np

    from uninext_tpu.data.coco import UniDatasetMapper
    from uninext_tpu.data.prompts import create_label_token_map
    from uninext_tpu.data.registry import get_dataset
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.evaluator import DetectionEvaluator

    tok = BertTokenizer()
    per, skipped = {}, []
    for sub in subsets:
        try:
            records, cats, _ = get_dataset(f"seginw_{sub}_val")
        except (FileNotFoundError, KeyError) as e:
            skipped.append(f"{sub}: {e}")
            continue
        mapper = UniDatasetMapper(cfg.data, cats, tok, is_train=False,
                                  with_masks=True)
        _, _, cmap = create_label_token_map(cats, tok,
                                            cfg.data.max_text_len)
        res = {}
        for iou_type, with_masks in (("bbox", False), ("segm", True)):
            ev = DetectionEvaluator(model, cfg, cmap, with_masks=with_masks)
            r = ev.evaluate(params, records, mapper, score_thr=0.05)
            res[iou_type] = {k: (None if not np.isfinite(v)
                                 else round(float(v), 4))
                             for k, v in r.items()}
        per[sub] = {"n_images": len(records), "n_categories": len(cats),
                    **res}
        if verbose:
            print(f"[seginw/{sub}] bbox AP {res['bbox']['AP']}  "
                  f"segm AP {res['segm']['AP']}", flush=True)
    aps = [v["segm"]["AP"] for v in per.values()
           if v["segm"]["AP"] is not None]
    baps = [v["bbox"]["AP"] for v in per.values()
            if v["bbox"]["AP"] is not None]
    return {
        "mean_segm_ap": round(float(np.mean(aps)), 4) if aps else None,
        "mean_bbox_ap": round(float(np.mean(baps)), 4) if baps else None,
        "n_datasets": len(per), "per_dataset": per, "skipped": skipped,
    }


def main():
    from uninext_tpu.data.registry import _SEGINW_SUBSETS

    ap = argparse.ArgumentParser()
    ap.add_argument("--subsets", nargs="*", default=list(_SEGINW_SUBSETS))
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--resume-dir", default=None,
                    help="output dir holding checkpoints/ (orbax)")
    ap.add_argument("--init-weights", default=None,
                    help="reference .pth to convert and evaluate")
    ap.add_argument("--config", default="image_joint_r50",
                    choices=["image_joint_r50", "tiny"])
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "SEGINW_RESULT.json"))
    ap.add_argument("--make-mini", action="store_true",
                    help="generate a 2-subset mini fixture and sweep it")
    ap.add_argument("--steps", type=int, default=200,
                    help="with --make-mini: train on a separate mini-coco "
                         "set first, then sweep SegInW zero-shot (0 = "
                         "random weights, schema check only)")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from uninext_tpu.models.detr import UninextDETR, init_all_paths

    if args.make_mini:
        from uninext_tpu.data.mini_coco import make_mini_seginw
        root = make_mini_seginw(tempfile.mkdtemp(prefix="mini_seginw_"),
                                subsets=("Chicken", "Cows"))
        os.environ["UNINEXT_DATA"] = root
        args.subsets = ["Chicken", "Cows"]
        print(f"[data] mini seginw at {root}")

    if args.config == "tiny":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from _evidence_common import build_tiny_cfg
        cfg = build_tiny_cfg(max(args.steps, 1), min_size=224, max_size=352)
    else:
        import dataclasses

        from uninext_tpu.config import image_joint_r50
        cfg = image_joint_r50()
        if args.make_mini:
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(
                    cfg.data, min_size_test=224, max_size_test=352))

    if args.make_mini and args.steps > 0:
        # zero-shot transfer demo: train on a SEPARATE mini-coco set (the
        # shared shape vocabulary), then sweep the unseen SegInW subsets
        # with no fine-tuning — the reference's SegInW protocol in
        # miniature
        from uninext_tpu.data.coco import UniDatasetMapper, load_coco_json
        from uninext_tpu.data.loader import MultiDatasetLoader
        from uninext_tpu.data.mini_coco import make_mini_coco
        from uninext_tpu.data.tokenizer import BertTokenizer
        from uninext_tpu.engine.trainer import Trainer
        troot = tempfile.mkdtemp(prefix="seginw_train_")
        tpaths = make_mini_coco(troot, seed=500)
        recs, cats = load_coco_json(tpaths["train_json"],
                                    tpaths["train_root"])
        mapper = UniDatasetMapper(cfg.data, cats, BertTokenizer(),
                                  is_train=True, with_masks=True, lsj=True,
                                  lsj_size=224, lsj_min_scale=0.6,
                                  lsj_max_scale=1.4)
        loader = MultiDatasetLoader([(recs, mapper, 2)], [1.0], seed=0,
                                    num_workers=2)
        trainer = Trainer(cfg, iter(loader),
                          output_dir=tempfile.mkdtemp(prefix="seginw_out_"),
                          task="detection", has_masks=True, use_mesh=False,
                          log_period=100)
        trainer.train()
        model, params = trainer.model, trainer.state.params
        result = run_seginw(model, params, cfg, args.subsets)
        result["config"] = args.config
        result["zero_shot"] = True
        result["trained_on"] = f"mini-coco ({args.steps} steps), SegInW " \
                               "subsets unseen"
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[done] zero-shot mean segm AP {result['mean_segm_ap']} "
              f"over {result['n_datasets']} datasets -> {args.out}")
        return

    model = UninextDETR(cfg)
    params = init_all_paths(model, jax.random.PRNGKey(0))["params"]
    if args.init_weights:
        from uninext_tpu.engine.convert import load_torch_checkpoint
        params = load_torch_checkpoint(args.init_weights, params)
    elif args.resume_dir:
        from uninext_tpu.engine.checkpoint import CheckpointManager
        ckpt = CheckpointManager(os.path.join(args.resume_dir,
                                              "checkpoints"))
        params, ok = ckpt.restore_params(params)
        if not ok:
            raise SystemExit(f"no checkpoint under {args.resume_dir}")

    result = run_seginw(model, params, cfg, args.subsets)
    result["config"] = args.config
    result["zero_shot"] = args.resume_dir is None and \
        args.init_weights is None
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[done] mean segm AP {result['mean_segm_ap']} over "
          f"{result['n_datasets']} datasets -> {args.out}")


if __name__ == "__main__":
    main()
