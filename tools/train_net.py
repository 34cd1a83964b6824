#!/usr/bin/env python
"""Training CLI.

Parity: reference launch.py + projects/UNINEXT/train_net.py. The reference's
multi-process NCCL launcher collapses to one SPMD process per host:
  single host : python tools/train_net.py --config image_joint_r50 ...
  multi host  : same command on every host with --coordinator set
                (jax.distributed.initialize handles rendezvous).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="image_joint_r50",
                   help="config preset name in uninext_tpu.config")
    p.add_argument("--recipe", default=None,
                   help="named training recipe (registry.TRAIN_RECIPES: "
                        "obj365_pretrain, image_joint, video_joint, "
                        "single_task_{det,rec,vis,sot,rvos}); resolves "
                        "datasets under $UNINEXT_DATA")
    p.add_argument("--task", default="detection",
                   choices=["detection", "grounding"])
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--coco-json", default=None)
    p.add_argument("--image-root", default=None)
    p.add_argument("--refcoco-json", default=None)
    p.add_argument("--init-weights", default=None,
                   help=".pth reference checkpoint to convert and load")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="host:port for multi-host jax.distributed")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("opts", nargs="*",
                   help="dotted config overrides, e.g. solver.base_lr=1e-4")
    return p.parse_args()


def apply_overrides(cfg, opts):
    import dataclasses
    for opt in opts:
        key, val = opt.split("=", 1)
        parts = key.split(".")
        node_path = []
        node = cfg
        for part in parts[:-1]:
            node = getattr(node, part)
            node_path.append(part)
        field = parts[-1]
        old = getattr(node, field)
        typ = type(old)
        new_val = typ(val) if typ is not bool else val.lower() in ("1", "true")
        new_node = dataclasses.replace(node, **{field: new_val})
        for part in reversed(node_path):
            parent = cfg
            for pp in node_path[:-1]:
                parent = getattr(parent, pp)
            new_node = dataclasses.replace(parent, **{part: new_node})
        cfg = new_node if node_path else dataclasses.replace(
            cfg, **{field: new_val})
    return cfg


def main():
    args = parse_args()
    if args.coordinator:
        import jax
        jax.distributed.initialize(args.coordinator, args.num_processes,
                                   args.process_id)
    from uninext_tpu import config as config_mod
    from uninext_tpu.data.coco import (UniDatasetMapper, load_coco_json,
                                       load_refcoco_json)
    from uninext_tpu.data.loader import MultiDatasetLoader, prefetch
    from uninext_tpu.engine.trainer import Trainer

    cfg = getattr(config_mod, args.config)()

    datasets = []
    ratios = None
    video = False
    categories = ["object"]
    if args.recipe:
        from uninext_tpu.data import registry
        base_name = registry.TRAIN_RECIPES[args.recipe][0]
        if args.config == "image_joint_r50" and base_name != args.config:
            cfg = getattr(config_mod, base_name)()
        cfg = apply_overrides(cfg, args.opts)
        cfg, datasets, ratios, video = registry.build_recipe(args.recipe, cfg)
    else:
        cfg = apply_overrides(cfg, args.opts)
    coco_records = refcoco_records = None
    if args.coco_json:
        coco_records, categories = load_coco_json(args.coco_json,
                                                  args.image_root)
        mapper = UniDatasetMapper(cfg.data, categories, is_train=True)
        datasets.append((coco_records, mapper, 2))
    if args.refcoco_json:
        refcoco_records = load_refcoco_json(args.refcoco_json,
                                            args.image_root)
        mapper = UniDatasetMapper(cfg.data, categories, is_train=True)
        datasets.append((refcoco_records, mapper, 2))
    if not datasets:
        raise SystemExit("no datasets given (--coco-json/--refcoco-json)")

    import jax

    if args.eval_only:
        # reference train_net.py --eval-only: build the model, load weights,
        # run the task evaluator over the given json, print metrics
        import json as json_mod

        from uninext_tpu.data.prompts import create_label_token_map
        from uninext_tpu.data.tokenizer import BertTokenizer
        from uninext_tpu.engine.checkpoint import CheckpointManager
        from uninext_tpu.engine.evaluator import (DetectionEvaluator,
                                                  evaluate_refcoco)
        from uninext_tpu.models.detr import init_all_paths, UninextDETR

        model = UninextDETR(cfg)
        params = init_all_paths(model, jax.random.PRNGKey(0))["params"]
        if args.init_weights:
            from uninext_tpu.engine.convert import load_torch_checkpoint
            params = load_torch_checkpoint(args.init_weights, params)
        elif args.resume:
            ckpt = CheckpointManager(f"{args.output_dir}/checkpoints")
            params, restored = ckpt.restore_params(params)
            if not restored:
                raise SystemExit(f"no checkpoint in {args.output_dir}")

        tok = BertTokenizer()
        eval_mapper = UniDatasetMapper(cfg.data, categories, tok,
                                       is_train=False, with_masks=False)
        # the jsons were already parsed above — no reload
        if args.task == "grounding":
            res = evaluate_refcoco(model, cfg, params, refcoco_records,
                                   eval_mapper)
        else:
            _, _, cmap = create_label_token_map(categories, tok,
                                                cfg.data.max_text_len)
            ev = DetectionEvaluator(model, cfg, cmap, with_masks=False)
            res = ev.evaluate(params, coco_records, eval_mapper)
        print(json_mod.dumps({k: float(v) for k, v in res.items()
                              if isinstance(v, (int, float))}, indent=1))
        return

    rec_weights = None
    if args.recipe:
        from uninext_tpu.data.registry import recipe_record_weights
        rec_weights = recipe_record_weights(args.recipe, datasets)
    loader = prefetch(iter(MultiDatasetLoader(
        datasets, ratios=ratios or [1.0] * len(datasets),
        record_weights=rec_weights,
        process_index=jax.process_index(),
        process_count=jax.process_count())))
    trainer = Trainer(cfg, loader, output_dir=args.output_dir,
                      task=args.task, video=video)
    trainer.resume_or_load(args.init_weights if not args.resume else None)
    trainer.train()


if __name__ == "__main__":
    main()
