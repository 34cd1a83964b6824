#!/usr/bin/env python
"""End-to-end REC P@0.5/oIoU on real-format RefCOCO-style data: files ->
grounding training -> expression evaluation.

Completes the evidence matrix for the expression-prompt family (BASELINE
config 3): generates a mini RefCOCO-format dataset (each record grounds one
shape by category + image side), trains the grounding path (pooled language
classifier, 1-token positive maps), and scores held-out expressions with
the RefCOCO metrics (P@0.5 / oIoU — the reference's
_derive_refcoco_results). Writes RECRESULT.json at the repo root, picked up
by bench.py's aggregate.

Usage: python tools/real_rec_check.py [--steps 300] [--device cpu|tpu]
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


def build_cfg(steps: int):
    from uninext_tpu.config import tiny_test_config
    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, max_insts=8, max_text_len=32,
            min_size_train=(224,), max_size_train=352,
            min_size_test=224, max_size_test=352),
        solver=dataclasses.replace(
            cfg.solver, base_lr=3e-4, lang_lr=3e-4, vl_lr=3e-4,
            backbone_multiplier=1.0, warmup_iters=40, grad_clip=1.0,
            max_iter=steps, checkpoint_period=10 ** 9,
            steps=(int(steps * 0.8),)),
    )
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--out", default=os.path.join(REPO, "RECRESULT.json"))
    ap.add_argument("--data-root", default=None)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from uninext_tpu.data.coco import UniDatasetMapper, load_refcoco_json
    from uninext_tpu.data.loader import MultiDatasetLoader
    from uninext_tpu.data.mini_coco import make_mini_refcoco
    from uninext_tpu.data.tokenizer import BertTokenizer
    from uninext_tpu.engine.evaluator import evaluate_refcoco, evaluate_res
    from uninext_tpu.engine.trainer import Trainer

    root = args.data_root or tempfile.mkdtemp(prefix="mini_refcoco_")
    paths = make_mini_refcoco(root)
    print(f"[data] mini-refcoco at {root}")

    cfg = build_cfg(args.steps)
    train_recs = load_refcoco_json(paths["train_json"], paths["train_root"])
    val_recs = load_refcoco_json(paths["val_json"], paths["val_root"])
    tok = BertTokenizer()
    mapper = UniDatasetMapper(cfg.data, ["object"], tok, is_train=True,
                              with_masks=True, lsj=True, lsj_size=224,
                              lsj_min_scale=0.6, lsj_max_scale=1.4)
    loader = MultiDatasetLoader([(train_recs, mapper, 2, "grounding")],
                                [1.0], seed=0, num_workers=2)

    out_dir = tempfile.mkdtemp(prefix="rec_check_out_")
    t0 = time.time()
    trainer = Trainer(cfg, iter(loader), output_dir=out_dir,
                      task="grounding", has_masks=True, use_mesh=False,
                      log_period=50)
    trainer.train()
    train_s = time.time() - t0
    print(f"[train] {args.steps} grounding steps in {train_s:.0f}s")

    eval_mapper = UniDatasetMapper(cfg.data, ["object"], tok,
                                   is_train=False, with_masks=False)
    res = evaluate_refcoco(trainer.model, cfg, trainer.state.params,
                           val_recs, eval_mapper)
    res = {k: round(float(v), 4) for k, v in res.items()
           if isinstance(v, (int, float)) and np.isfinite(v)}
    print(f"[eval REC] {res}")
    seg = evaluate_res(trainer.model, cfg, trainer.state.params,
                       val_recs, eval_mapper)
    seg = {k: round(float(v), 4) for k, v in seg.items()}
    print(f"[eval RES] {seg}")

    payload = {
        "rec_p_at_50": res.get("P@0.5"), "rec_oiou": res.get("oIoU"),
        "res_mask_p_at_50": seg["P@0.5"], "res_mask_miou": seg["mIoU"],
        "res_mask_oiou": seg["oIoU"],
        "dataset": "mini-refcoco (real-format generated)",
        "n_train_expr": len(train_recs), "n_val_expr": len(val_recs),
        "steps": args.steps, "train_seconds": round(train_s, 1),
        "pipeline": "jpeg->expression mapper->Trainer(grounding)->"
                    "evaluate_refcoco(P@0.5/oIoU)",
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"[done] wrote {args.out}")


if __name__ == "__main__":
    main()
