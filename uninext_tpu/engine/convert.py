"""Reference-checkpoint (.pth) -> flax parameter conversion.

Parity: the reference's three-stage pipeline hands torch weights forward
(SURVEY §5: obj365 pretrain -> image joint -> 4ch inflation -> video joint);
this module lets those zoo checkpoints initialize UninextDETR for parity
debugging and fine-tuning. Torch layouts are transposed to flax conventions:
  Linear (out,in) -> Dense kernel (in,out)
  Conv (out,in,kh,kw) -> (kh,kw,in,out)
  MultiheadAttention in_proj -> split q/k/v
FrozenBN running stats map onto our (scale,bias,mean,var) params.

Best-effort: keys that do not resolve are collected and reported, never
silently dropped. (No reference checkpoint ships in this sandbox, so this
path is exercised by tests/test_convert.py on a synthetic state_dict.)
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _set(tree: Dict, path: List[str], value: np.ndarray, report: Dict):
    node = tree
    for p in path[:-1]:
        if p not in node:
            report["missing_target"].append("/".join(path))
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report["missing_target"].append("/".join(path))
        return
    if node[leaf].shape != value.shape:
        report["shape_mismatch"].append(
            ("/".join(path), tuple(node[leaf].shape), tuple(value.shape)))
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    report["loaded"] += 1


def _dense(sd, prefix, tree, path, report, transpose=True):
    w = sd.get(prefix + ".weight")
    b = sd.get(prefix + ".bias")
    if w is not None:
        _set(tree, path + ["kernel"], _t(w).T if transpose else _t(w), report)
    if b is not None:
        _set(tree, path + ["bias"], _t(b), report)


def _conv(sd, prefix, tree, path, report):
    w = sd.get(prefix + ".weight")
    b = sd.get(prefix + ".bias")
    if w is not None:
        _set(tree, path + ["kernel"], _t(w).transpose(2, 3, 1, 0), report)
    if b is not None:
        _set(tree, path + ["bias"], _t(b), report)


def _frozen_bn(sd, prefix, tree, path, report):
    for src, dst in (("weight", "scale"), ("bias", "bias"),
                     ("running_mean", "mean"), ("running_var", "var")):
        v = sd.get(prefix + "." + src)
        if v is not None:
            _set(tree, path + [dst], _t(v), report)


_RES_STAGES = {"res2": 0, "res3": 1, "res4": 2, "res5": 3}


def convert_resnet(sd: Dict, tree: Dict, report: Dict,
                   src_prefix: str = "detr.detr.backbone.0.backbone.",
                   dst_root: str = "backbone"):
    """detectron2 ResNet state_dict -> our ResNet module tree."""
    _conv(sd, src_prefix + "stem.conv1", tree, [dst_root, "stem_conv"], report)
    _frozen_bn(sd, src_prefix + "stem.conv1.norm", tree,
               [dst_root, "stem_bn"], report)
    pat = re.compile(r"(res[2-5])\.(\d+)\.(conv\d|shortcut)")
    seen = set()
    for key in sd:
        if not key.startswith(src_prefix):
            continue
        m = pat.search(key[len(src_prefix):])
        if not m:
            continue
        stage, block, conv = m.groups()
        tag = (stage, block, conv)
        if tag in seen:
            continue
        seen.add(tag)
        base = f"{src_prefix}{stage}.{block}.{conv}"
        dst_block = f"{stage}_block{block}"
        name = {"conv1": "conv1", "conv2": "conv2", "conv3": "conv3",
                "shortcut": "shortcut"}[conv]
        bn = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
              "shortcut": "shortcut_bn"}[conv]
        _conv(sd, base, tree, [dst_root, dst_block, name], report)
        _frozen_bn(sd, base + ".norm", tree, [dst_root, dst_block, bn], report)


def convert_bert(sd: Dict, tree: Dict, report: Dict,
                 src_prefix: str = "text_encoder.body.body.",
                 dst_root: str = "bert"):
    emb = src_prefix + "embeddings."
    for src, dst in (("word_embeddings", "word_embeddings"),
                     ("position_embeddings", "position_embeddings"),
                     ("token_type_embeddings", "token_type_embeddings")):
        w = sd.get(emb + src + ".weight")
        if w is not None:
            _set(tree, [dst_root, dst, "embedding"], _t(w), report)
    _dense(sd, emb + "LayerNorm", tree, [dst_root, "embeddings_ln"], report,
           transpose=False)
    # LayerNorm: weight->scale
    w = sd.get(emb + "LayerNorm.weight")
    if w is not None:
        _set(tree, [dst_root, "embeddings_ln", "scale"], _t(w), report)
    i = 0
    while f"{src_prefix}encoder.layer.{i}.attention.self.query.weight" in sd:
        lp = f"{src_prefix}encoder.layer.{i}."
        dst = [dst_root, f"layer_{i}"]
        _dense(sd, lp + "attention.self.query", tree,
               dst + ["attention", "query"], report)
        _dense(sd, lp + "attention.self.key", tree,
               dst + ["attention", "key"], report)
        _dense(sd, lp + "attention.self.value", tree,
               dst + ["attention", "value"], report)
        _dense(sd, lp + "attention.output.dense", tree,
               dst + ["attention", "output"], report)
        for src_ln, dst_ln in (("attention.output.LayerNorm", "attention_ln"),
                               ("output.LayerNorm", "output_ln")):
            w = sd.get(lp + src_ln + ".weight")
            b = sd.get(lp + src_ln + ".bias")
            if w is not None:
                _set(tree, dst + [dst_ln, "scale"], _t(w), report)
            if b is not None:
                _set(tree, dst + [dst_ln, "bias"], _t(b), report)
        _dense(sd, lp + "intermediate.dense", tree, dst + ["intermediate"],
               report)
        _dense(sd, lp + "output.dense", tree, dst + ["ffn_output"], report)
        i += 1


def convert_checkpoint(state_dict: Dict, params: Dict) -> Tuple[Dict, Dict]:
    """Map a reference UNINEXT state_dict onto our param tree (best effort).

    Returns (new_params, report). Currently covers backbone + BERT; the
    transformer/heads mapping grows with parity debugging needs."""
    import copy
    tree = copy.deepcopy(jax_tree_to_numpy(params))
    report = {"loaded": 0, "missing_target": [], "shape_mismatch": []}
    convert_resnet(state_dict, tree, report)
    convert_bert(state_dict, tree, report)
    return tree, report


def jax_tree_to_numpy(params):
    import jax
    return jax.tree.map(np.asarray, params)


def load_torch_checkpoint(path: str, params: Dict) -> Dict:
    import torch
    sd = torch.load(path, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]
    new_params, report = convert_checkpoint(sd, params)
    print(f"[convert] loaded {report['loaded']} tensors; "
          f"{len(report['missing_target'])} unresolved, "
          f"{len(report['shape_mismatch'])} shape mismatches")
    return new_params
