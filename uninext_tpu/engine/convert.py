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


def convert_vit(sd: Dict, tree: Dict, report: Dict,
                src_prefix: str = "detr.detr.backbone.0.backbone.",
                dst_root: str = "backbone"):
    """Reference D2ViT (backbone/vit.py:233-432) state_dict -> our ViT tree:
    patch_embed.proj, pos_embed (pretrain 224+cls), per-block
    norm1/norm2/attn.{qkv,proj,rel_pos_h,rel_pos_w}/mlp.{fc1,fc2}, and the
    fpn1 deconv (ConvTranspose2d (in,out,kh,kw) -> flax (kh,kw,in,out))."""
    if src_prefix + "patch_embed.proj.weight" not in sd:
        return
    _conv(sd, src_prefix + "patch_embed.proj", tree,
          [dst_root, "patch_embed"], report)
    pos = sd.get(src_prefix + "pos_embed")
    if pos is not None:
        _set(tree, [dst_root, "pos_embed"], _t(pos), report)
    i = 0
    while f"{src_prefix}blocks.{i}.norm1.weight" in sd:
        bp = f"{src_prefix}blocks.{i}."
        d = [dst_root, f"block_{i}"]
        _ln(sd, bp + "norm1", tree, d + ["norm1"], report)
        _ln(sd, bp + "norm2", tree, d + ["norm2"], report)
        _dense(sd, bp + "attn.qkv", tree, d + ["attn", "qkv"], report)
        _dense(sd, bp + "attn.proj", tree, d + ["attn", "proj"], report)
        for rp in ("rel_pos_h", "rel_pos_w"):
            v = sd.get(bp + "attn." + rp)
            if v is not None:
                _set(tree, d + ["attn", rp], _t(v), report)
        _dense(sd, bp + "mlp.fc1", tree, d + ["mlp1"], report)
        _dense(sd, bp + "mlp.fc2", tree, d + ["mlp2"], report)
        i += 1
    # fpn1.0 ConvTranspose2d (in, out, kh, kw): output[2i+di, 2j+dj] =
    # x[i,j] . w[:, :, di, dj] -> our depth-to-space Dense (in, kh*kw*out)
    w = sd.get(src_prefix + "fpn1.0.weight")
    if w is not None:
        w = _t(w)                                  # (in, out, 2, 2)
        w = w.transpose(0, 2, 3, 1)                # (in, di, dj, out)
        _set(tree, [dst_root, "up_res3", "kernel"],
             w.reshape(w.shape[0], -1), report)
    b = sd.get(src_prefix + "fpn1.0.bias")
    if b is not None:
        _set(tree, [dst_root, "up_res3", "bias"], np.tile(_t(b), 4), report)


def _ln_convnext(sd, prefix, tree, path, report):
    """The reference ConvNeXt's custom LayerNorm stores scale/bias as
    nn.Embedding(1, dim) (backbone/convnext.py:175-176), so its state_dict
    keys are `<norm>.weight.weight` / `<norm>.bias.weight` with shape
    (1, dim). Accept that layout AND the standard `.weight`/`.bias` one
    (pre-fork ConvNeXt checkpoints)."""
    w = sd.get(prefix + ".weight")
    if w is not None and w.ndim == 1:
        _ln(sd, prefix, tree, path, report)
        return
    w = sd.get(prefix + ".weight.weight")
    b = sd.get(prefix + ".bias.weight")
    if w is not None:
        _set(tree, path + ["scale"], _t(w).reshape(-1), report)
    if b is not None:
        _set(tree, path + ["bias"], _t(b).reshape(-1), report)


def convert_convnext(sd: Dict, tree: Dict, report: Dict,
                     src_prefix: str = "detr.detr.backbone.0.backbone.",
                     dst_root: str = "backbone"):
    """Reference ConvNeXt (backbone/convnext.py:60-150) -> our tree:
    downsample_layers.0.{0,1} stem conv+norm; downsample_layers.i.{0,1}
    norm+conv (i>=1); stages.i.j.{dwconv,norm,pwconv1,pwconv2,gamma};
    out norms norm{i} -> out_norm_res{i+2}. gamma AND every custom
    LayerNorm's scale/bias are stored as nn.Embedding(1, dim) weights
    (convnext.py:37,175-176) -> our (dim,) params (_ln_convnext)."""
    if src_prefix + "downsample_layers.0.0.weight" not in sd:
        return
    _conv(sd, src_prefix + "downsample_layers.0.0", tree,
          [dst_root, "stem_conv"], report)
    _ln_convnext(sd, src_prefix + "downsample_layers.0.1", tree,
                 [dst_root, "stem_norm"], report)
    for i in range(1, 4):
        _ln_convnext(sd, f"{src_prefix}downsample_layers.{i}.0", tree,
                     [dst_root, f"down_norm_{i}"], report)
        _conv(sd, f"{src_prefix}downsample_layers.{i}.1", tree,
              [dst_root, f"down_conv_{i}"], report)
    for i in range(4):
        j = 0
        while f"{src_prefix}stages.{i}.{j}.dwconv.weight" in sd:
            bp = f"{src_prefix}stages.{i}.{j}."
            d = [dst_root, f"stage{i}_block{j}"]
            _conv(sd, bp + "dwconv", tree, d + ["dwconv"], report)
            _ln_convnext(sd, bp + "norm", tree, d + ["norm"], report)
            _dense(sd, bp + "pwconv1", tree, d + ["pwconv1"], report)
            _dense(sd, bp + "pwconv2", tree, d + ["pwconv2"], report)
            g = sd.get(bp + "gamma.weight")
            if g is not None:
                _set(tree, d + ["gamma"], _t(g).reshape(-1), report)
            j += 1
        # reference out-norms exist for stages 1-3 only (norm1..norm3,
        # convnext.py:106-110); stage-0 output has no norm and is not used
        _ln_convnext(sd, f"{src_prefix}norm{i}", tree,
                     [dst_root, f"out_norm_res{i + 2}"], report)


def _detect_bert_prefix(sd: Dict) -> str:
    """The real checkpoints store BERT under text_encoder.body.model.
    (uninext_img.py:138 wraps BertEncoder, whose HF module is `.model`);
    older synthetic fixtures used .body.body. Detect whichever is present."""
    probe = "embeddings.word_embeddings.weight"
    for k in sd:
        if k.endswith(probe):
            return k[:-len(probe)]
    return "text_encoder.body.model."


def convert_bert(sd: Dict, tree: Dict, report: Dict,
                 src_prefix: str = None,
                 dst_root: str = "bert"):
    if src_prefix is None:
        src_prefix = _detect_bert_prefix(sd)
    emb = src_prefix + "embeddings."
    for src, dst in (("word_embeddings", "word_embeddings"),
                     ("position_embeddings", "position_embeddings"),
                     ("token_type_embeddings", "token_type_embeddings")):
        w = sd.get(emb + src + ".weight")
        if w is not None:
            _set(tree, [dst_root, dst, "embedding"], _t(w), report)
    w = sd.get(emb + "LayerNorm.weight")
    b = sd.get(emb + "LayerNorm.bias")
    if w is not None:
        _set(tree, [dst_root, "embeddings_ln", "scale"], _t(w), report)
    if b is not None:
        _set(tree, [dst_root, "embeddings_ln", "bias"], _t(b), report)
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


def _ln(sd, prefix, tree, path, report):
    w = sd.get(prefix + ".weight")
    b = sd.get(prefix + ".bias")
    if w is not None:
        _set(tree, path + ["scale"], _t(w), report)
    if b is not None:
        _set(tree, path + ["bias"], _t(b), report)


def _mha(sd, prefix, tree, path, report):
    """torch nn.MultiheadAttention -> our MultiHeadAttention q/k/v/out."""
    w = sd.get(prefix + ".in_proj_weight")
    b = sd.get(prefix + ".in_proj_bias")
    if w is not None:
        wq, wk, wv = np.split(_t(w), 3, axis=0)
        for name, ww in (("q_proj", wq), ("k_proj", wk), ("v_proj", wv)):
            _set(tree, path + [name, "kernel"], ww.T, report)
    if b is not None:
        bq, bk, bv = np.split(_t(b), 3)
        for name, bb in (("q_proj", bq), ("k_proj", bk), ("v_proj", bv)):
            _set(tree, path + [name, "bias"], bb, report)
    _dense(sd, prefix + ".out_proj", tree, path + ["out_proj"], report)


def _msda(sd, prefix, tree, path, report):
    for name in ("sampling_offsets", "attention_weights", "value_proj",
                 "output_proj"):
        _dense(sd, f"{prefix}.{name}", tree, path + [name], report)


def _mlp(sd, prefix, tree, path, report, n_layers=3):
    for j in range(n_layers):
        _dense(sd, f"{prefix}.layers.{j}", tree, path + [f"layer_{j}"], report)


def convert_transformer(sd: Dict, tree: Dict, report: Dict,
                        src: str = "detr.detr."):
    tp = src + "transformer."
    dst = "transformer"
    lvl = sd.get(tp + "level_embed")
    if lvl is not None:
        _set(tree, [dst, "level_embed"], _t(lvl), report)
    w = sd.get(tp + "tgt_embed.weight")
    if w is not None:
        _set(tree, [dst, "tgt_embed_weight"], _t(w), report)
    _dense(sd, tp + "enc_output", tree, [dst, "enc_output"], report)
    _ln(sd, tp + "enc_output_norm", tree, [dst, "enc_output_norm"], report)
    _dense(sd, tp + "resizer.fc", tree, [dst, "resizer", "fc"], report)
    _ln(sd, tp + "resizer.layer_norm", tree, [dst, "resizer", "ln"], report)
    _mlp(sd, tp + "decoder.ref_point_head", tree,
         [dst, "ref_point_head"], report, 2)

    scan_layout = "encoder_scan" in tree.get(dst, {})
    if scan_layout:
        # stacked-scan layout: load each torch layer into a scratch tree of
        # the single-layer structure, then write stacked along axis 0
        import jax as _jax
        proto = jax_tree_to_numpy(tree[dst]["encoder_scan"]["layer"])
        per_layer = []
        i = 0
        while f"{tp}encoder.layers.{i}.norm1.weight" in sd:
            # unstacked single-layer template with the right shapes
            scratch = {"layer": _jax.tree.map(
                lambda x: np.array(x[min(i, x.shape[0] - 1)]), proto)}
            lp = f"{tp}encoder.layers.{i}"
            d = ["layer"]
            _msda(sd, lp + ".self_attn", scratch, d + ["self_attn"], report)
            _ln(sd, lp + ".norm1", scratch, d + ["norm1"], report)
            _ln(sd, lp + ".norm2", scratch, d + ["norm2"], report)
            _dense(sd, lp + ".linear1", scratch, d + ["linear1"], report)
            _dense(sd, lp + ".linear2", scratch, d + ["linear2"], report)
            per_layer.append(scratch["layer"])
            i += 1
        if per_layer:
            tree[dst]["encoder_scan"]["layer"] = _jax.tree.map(
                lambda *xs: np.stack(xs), *per_layer)
    else:
        i = 0
        while f"{tp}encoder.layers.{i}.norm1.weight" in sd:
            lp = f"{tp}encoder.layers.{i}"
            d = [dst, f"encoder_layer_{i}"]
            _msda(sd, lp + ".self_attn", tree, d + ["self_attn"], report)
            _ln(sd, lp + ".norm1", tree, d + ["norm1"], report)
            _ln(sd, lp + ".norm2", tree, d + ["norm2"], report)
            _dense(sd, lp + ".linear1", tree, d + ["linear1"], report)
            _dense(sd, lp + ".linear2", tree, d + ["linear2"], report)
            i += 1
    i = 0
    while f"{tp}encoder.vl_layers.{i}.b_attn.gamma_v" in sd:
        lp = f"{tp}encoder.vl_layers.{i}.b_attn"
        d = [dst, f"vl_layer_{i}"]
        for g in ("gamma_v", "gamma_l"):
            v = sd.get(f"{lp}.{g}")
            if v is not None:
                _set(tree, d + [g], _t(v), report)
        _ln(sd, lp + ".layer_norm_v", tree, d + ["layer_norm_v"], report)
        _ln(sd, lp + ".layer_norm_l", tree, d + ["layer_norm_l"], report)
        for name in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                     "out_v_proj", "out_l_proj"):
            _dense(sd, f"{lp}.attn.{name}", tree, d + ["attn", name], report)
        i += 1
    i = 0
    while f"{tp}decoder.layers.{i}.norm1.weight" in sd:
        lp = f"{tp}decoder.layers.{i}"
        d = [dst, f"decoder_layer_{i}"]
        _msda(sd, lp + ".cross_attn", tree, d + ["cross_attn"], report)
        _mha(sd, lp + ".self_attn", tree, d + ["self_attn"], report)
        for nm in ("norm1", "norm2", "norm3"):
            _ln(sd, f"{lp}.{nm}", tree, d + [nm], report)
        _dense(sd, lp + ".linear1", tree, d + ["linear1"], report)
        _dense(sd, lp + ".linear2", tree, d + ["linear2"], report)
        i += 1


def convert_heads(sd: Dict, tree: Dict, report: Dict, src: str = "detr.detr.",
                  dec_layers: int = None):
    if dec_layers is None:
        # class_embed has dec_layers+1 entries (the last generates encoder
        # region proposals, deformable_detr.py:150-174); detect from the sd
        pat = re.compile(re.escape(src)
                         + r"(?:class_embed|bbox_embed|iou_head)\.(\d+)\.")
        idxs = [int(m.group(1)) for k in sd for m in [pat.match(k)] if m]
        dec_layers = max(idxs) if idxs else 0
    for i in range(dec_layers):
        cp = f"{src}class_embed.{i}"
        d = [f"class_embed_{i}"]
        _dense(sd, cp + ".dot_product_projection_text", tree,
               d + ["dot_product_projection_text"], report)
        for nm in ("log_scale", "bias_lang", "bias0"):
            v = sd.get(f"{cp}.{nm}")
            if v is not None:
                _set(tree, d + [nm], _t(v).reshape(-1), report)
        _mlp(sd, f"{src}bbox_embed.{i}", tree, [f"bbox_embed_{i}"], report)
        _dense(sd, f"{src}iou_head.{i}", tree, [f"iou_head_{i}"], report)
    # encoder heads: bbox_embed[dec_layers], class_embed[dec_layers] (Still)
    _mlp(sd, f"{src}bbox_embed.{dec_layers}", tree,
         [f"bbox_embed_{dec_layers}"], report)
    _dense(sd, f"{src}class_embed.{dec_layers}.body", tree,
           ["enc_class_embed", "body"], report)
    # input projections: .0 conv, .1 group norm
    i = 0
    while f"{src}input_proj.{i}.0.weight" in sd:
        _conv(sd, f"{src}input_proj.{i}.0", tree, [f"input_proj_{i}"], report)
        _ln(sd, f"{src}input_proj.{i}.1", tree, [f"input_gn_{i}"], report)
        i += 1


def convert_mask_head(sd: Dict, tree: Dict, report: Dict,
                      src: str = "detr."):
    _mlp(sd, src + "controller", tree, ["controller"], report)
    for nm in ("lay1", "lay2", "lay3", "lay4", "jia_dcn"):
        _conv(sd, f"{src}mask_head.{nm}", tree, ["mask_head", nm], report)
    # DN dynamic label encoder (DDETRSegmUniDN.resizer)
    _dense(sd, src + "resizer.fc", tree, ["dn_resizer", "fc"], report)
    _ln(sd, src + "resizer.layer_norm", tree, ["dn_resizer", "ln"], report)
    # video-specific params (DDETRSegmUniVIDDN, ddetrs_vid_dn.py:30-64)
    _dense(sd, src + "adjust_layer", tree, ["adjust_layer"], report)
    if f"{src}reid_embed_head.layers.0.weight" in sd:
        # plain MLP reid head
        _mlp(sd, src + "reid_embed_head", tree, ["reid_embed"], report)
    elif f"{src}reid_embed_head.1.layers.0.weight" in sd:
        # USE_DEFORMABLE_REID_HEAD: [0]=DeformableReidHead, [1]=MLP
        i = 0
        while f"{src}reid_embed_head.0.layers.{i}.norm1.weight" in sd:
            lp = f"{src}reid_embed_head.0.layers.{i}"
            d = [f"reid_dec_{i}"]
            _msda(sd, lp + ".cross_attn", tree, d + ["cross_attn"], report)
            _mha(sd, lp + ".self_attn", tree, d + ["self_attn"], report)
            for nm in ("norm1", "norm2", "norm3"):
                _ln(sd, f"{lp}.{nm}", tree, d + [nm], report)
            _dense(sd, lp + ".linear1", tree, d + ["linear1"], report)
            _dense(sd, lp + ".linear2", tree, d + ["linear2"], report)
            i += 1
        _mlp(sd, src + "reid_embed_head.0.ref_point_head", tree,
             ["reid_ref_point_head"], report, 2)
        _mlp(sd, src + "reid_embed_head.1", tree, ["reid_embed"], report)
    # SOT FeatureFuser (SOT.FEAT_FUSE; ddetrs_vid_dn.py:880)
    i = 0
    while f"{src}sot_fuser.refine.{i}.weight" in sd:
        _conv(sd, f"{src}sot_fuser.refine.{i}", tree,
              ["sot_fuser", f"refine_{i}"], report)
        i += 1


def convert_checkpoint(state_dict: Dict, params: Dict) -> Tuple[Dict, Dict]:
    """Map a reference UNINEXT state_dict onto our param tree (best effort).

    Returns (new_params, report). Covers backbone, BERT, transformer
    (encoder/VL/decoder), heads, CondInst controller+mask head, dn resizer,
    reid head. Unresolved keys are reported, never dropped silently."""
    import copy
    full = copy.deepcopy(jax_tree_to_numpy(params))
    tree = full.get("params", full) if isinstance(full, dict) else full
    report = {"loaded": 0, "missing_target": [], "shape_mismatch": []}

    class _RecordingDict(dict):
        """Tracks which source keys conversion actually consumed so silent
        coverage gaps (a renamed prefix, a new head) surface in the report."""

        def __init__(self, base):
            super().__init__(base)
            self.consumed = set()

        def get(self, key, default=None):
            if dict.__contains__(self, key):
                self.consumed.add(key)
            return dict.get(self, key, default)

        def __getitem__(self, key):
            self.consumed.add(key)
            return dict.__getitem__(self, key)

        def __contains__(self, key):
            found = dict.__contains__(self, key)
            if found:
                self.consumed.add(key)
            return found

    rec = _RecordingDict(state_dict)
    convert_resnet(rec, tree, report)
    # 4-channel template backbone (UNINEXT_VID ref_backbone,
    # uninext_vid.py:160-167)
    if any(k.startswith("detr.detr.ref_backbone.") for k in state_dict):
        # same backbone family as the main branch: ResNet or D2ViT
        convert_resnet(rec, tree, report,
                       src_prefix="detr.detr.ref_backbone.0.backbone.",
                       dst_root="template_backbone")
        convert_vit(rec, tree, report,
                    src_prefix="detr.detr.ref_backbone.0.backbone.",
                    dst_root="template_backbone")
    convert_vit(rec, tree, report)
    convert_convnext(rec, tree, report)
    convert_bert(rec, tree, report)
    convert_transformer(rec, tree, report)
    convert_heads(rec, tree, report)
    convert_mask_head(rec, tree, report)
    report["unused_source"] = sorted(
        k for k in rec if k not in rec.consumed
        and not k.endswith("num_batches_tracked"))
    return full, report


def jax_tree_to_numpy(params):
    import jax
    return jax.tree.map(np.asarray, params)


def _require_real_vocab_for(sd: Dict) -> None:
    """HARD error when reference-converted BERT weights meet the hash-vocab
    tokenizer (documented divergence #4, docs/PARITY.md).

    The reference tokenizes with bert-base-uncased's vocab.txt
    (bert_model.py:10-31); our BertTokenizer silently falls back to a
    deterministic hash vocab when no vocab file is supplied — fine for
    training from scratch, but a checkpoint whose word-embedding table was
    trained against the REAL vocab would silently mis-tokenize every
    prompt. Refusing here (VERDICT r4 #8) makes that failure impossible.
    Escape hatch for synthetic fixtures: UNINEXT_ALLOW_HASH_VOCAB=1."""
    import os
    if os.environ.get("UNINEXT_ALLOW_HASH_VOCAB") == "1":
        return
    probe = "embeddings.word_embeddings.weight"
    if not any(k.endswith(probe) for k in sd):
        return                      # no language tower in this checkpoint
    from ..data.tokenizer import BertTokenizer
    if BertTokenizer().vocab is None:
        raise RuntimeError(
            "This checkpoint carries a BERT word-embedding table trained "
            "against a real WordPiece vocab, but no vocab.txt is available "
            "— the hash-vocab fallback would silently mis-tokenize every "
            "prompt. Supply bert-base-uncased vocab.txt via the "
            "UNINEXT_BERT_VOCAB env var (see docs/DATA.md), or set "
            "UNINEXT_ALLOW_HASH_VOCAB=1 only for synthetic fixtures.")


def load_torch_checkpoint(path: str, params: Dict) -> Dict:
    import torch
    sd = torch.load(path, map_location="cpu")
    if "model" in sd:
        sd = sd["model"]
    _require_real_vocab_for(sd)
    new_params, report = convert_checkpoint(sd, params)
    print(f"[convert] loaded {report['loaded']} tensors; "
          f"{len(report['missing_target'])} unresolved, "
          f"{len(report['shape_mismatch'])} shape mismatches")
    return new_params
