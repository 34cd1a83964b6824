"""UninextDETR — the unified prompt-conditioned instance-perception model.

One functional model covering the reference's UNINEXT_IMG meta-architecture
(uninext_img.py:40-658) and the DDETRSegmUniDN wrapper (ddetrs_dn.py:29-553):
backbone -> input projections -> VL-fused deformable transformer (two-stage,
DINO denoising) -> per-layer VL-alignment classification + box refinement +
IoU branch + CondInst dynamic mask head; losses computed in-graph.

Every task reduces to:
    (image, image_mask, prompt_tokens, prompt_mask) ->
    (alignment logits, boxes, masks, [reid embeds], ious)

Static-shape contract (TPU): images arrive padded to a resolution bucket;
targets padded to (max_insts); prompts padded to max_text_len; the DINO
denoising block has a fixed (groups x single_pad) layout. `task` is a static
argument (one compiled graph per task).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import UninextConfig
from ..utils.misc import agg_lang_feat, inverse_sigmoid
from ..utils import box_ops
from . import criterion as crit
from .bert import BertEncoder
from .heads import StillClassifier, VLAlign
from .layers import MLP, FeatureResizer
from .mask_head import (MaskHeadSmallConv, dynamic_mask_forward,
                        num_gen_params)
from .matcher import (hungarian_match, ota_cost_and_iou, simota_match,
                      vl_cost_matrix)
from .position_encoding import position_embedding_sine
from .resnet import ResNet
from .transformer import UninextTransformer

# static DINO-denoising layout: dn_groups groups of (pos | neg) blocks with
# dn_single_pad slots each (see docstring of prepare_dn_static)
DN_SINGLE_PAD = 20
DN_GROUPS = 5


def _downsample_mask(mask: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-downsample a (B, H, W) bool padding mask to (B, h, w)."""
    mask = jnp.asarray(mask)
    H, W = mask.shape[1:]
    h, w = hw
    iy = (jnp.arange(h) * H) // h
    ix = (jnp.arange(w) * W) // w
    return mask[:, iy][:, :, ix]


def feature_shapes(num_levels: int, H: int, W: int
                   ) -> Tuple[Tuple[int, int], ...]:
    """Static per-level (h, w) for a padded (H, W) input: strides 8/16/32,
    then stride-2 convs (k=3, p=1) for extra levels."""
    shapes = [(H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32)]
    while len(shapes) < num_levels:
        h, w = shapes[-1]
        shapes.append(((h + 1) // 2, (w + 1) // 2))
    return tuple(shapes[:num_levels])


def select_matched(q2g: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """First `n` matched query indices per image (ascending query order).

    q2g: (B, Q) -> (sel_q (B, n) int32, sel_valid (B, n) bool)."""
    B, Q = q2g.shape
    key = jnp.where(q2g >= 0, jnp.arange(Q)[None], Q + jnp.arange(Q)[None])
    sel_q = jnp.argsort(key, axis=-1)[:, :n].astype(jnp.int32)
    sel_valid = jnp.take_along_axis(q2g, sel_q, axis=1) >= 0
    return sel_q, sel_valid


def build_dn_attn_mask(num_queries: int, single_pad: int = DN_SINGLE_PAD,
                       groups: int = DN_GROUPS) -> np.ndarray:
    """Static (pad+Q, pad+Q) bool mask, True = blocked.

    Parity: ddetrs_dn.py:678-706 — matching queries can't see dn queries;
    dn groups can't see each other."""
    pad = 2 * single_pad * groups
    n = pad + num_queries
    m = np.zeros((n, n), dtype=bool)
    m[pad:, :pad] = True
    for g in range(groups):
        lo, hi = 2 * single_pad * g, 2 * single_pad * (g + 1)
        m[lo:hi, hi:pad] = True
        m[lo:hi, :lo] = True
    return m


def prepare_dn_static(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                      label_enc: jnp.ndarray, rng: jax.Array,
                      box_noise_scale: float,
                      single_pad: int = DN_SINGLE_PAD,
                      groups: int = DN_GROUPS):
    """Static-shape contrastive denoising queries.

    Parity: ddetrs_dn.prepare_for_cdn (:558-712) with a fixed layout: instead
    of `groups = 200 // (2*max_gt_in_batch)`, we always build `groups` groups
    holding the first `single_pad` GTs of each image (documented divergence —
    crowded images beyond single_pad get no dn supervision).

    Returns (dn_tgt (B,pad,C), dn_ref_unact (B,pad,4), dn_q2g (B,pad) int32,
    dn_valid_count scalar helper is derived by caller from dn_q2g).
    """
    B, G = gt_valid.shape
    C = label_enc.shape[-1]
    single_pad = min(single_pad, G)
    pad = 2 * single_pad * groups
    boxes = gt_boxes[:, :single_pad]                        # (B, S, 4)
    valid = gt_valid[:, :single_pad]                        # (B, S)

    # (B, groups, 2, S, 4): pos/neg copies per group
    b = jnp.tile(boxes[:, None, None], (1, groups, 2, 1, 1))
    k_sign, k_part = jax.random.split(rng)
    sign = jax.random.rademacher(k_sign, b.shape, dtype=jnp.float32)
    part = jax.random.uniform(k_part, b.shape)
    is_neg = jnp.zeros((1, 1, 2, 1, 1)).at[:, :, 1].set(1.0)
    part = part + is_neg                                     # neg in [1, 2]
    xyxy = box_ops.box_cxcywh_to_xyxy(b)
    half_wh = jnp.concatenate([b[..., 2:] / 2, b[..., 2:] / 2], -1)
    noised = jnp.clip(xyxy + sign * part * half_wh * box_noise_scale, 0.0, 1.0)
    noised = box_ops.box_xyxy_to_cxcywh(noised)
    noised = noised.reshape(B, pad, 4)

    v = jnp.tile(valid[:, None, None], (1, groups, 2, 1)).reshape(B, pad)
    dn_ref_unact = jnp.where(v[..., None], inverse_sigmoid(noised), 0.0)
    dn_tgt = jnp.where(v[..., None], jnp.tile(label_enc[:, None], (1, pad, 1)), 0.0)

    # supervision map: positive slots (copy 0 of each group) <- gt j
    g_idx = jnp.tile(jnp.arange(single_pad, dtype=jnp.int32)[None, None, None],
                     (B, groups, 2, 1))
    is_pos = jnp.zeros((1, 1, 2, 1), bool).at[:, :, 0].set(True)
    dn_q2g = jnp.where(jnp.tile(valid[:, None, None], (1, groups, 2, 1)) & is_pos,
                       g_idx, -1).reshape(B, pad)
    return dn_tgt, dn_ref_unact, dn_q2g


def init_all_paths(model: "UninextDETR", rng: jax.Array,
                   H: int = 192, W: int = 256):
    """Initialize EVERY parameter of the unified model in one pass.

    The standard image init misses the SOT/VOS template branch (adjust_layer,
    optional template backbone) and, for image configs, the reid head; this
    helper runs all paths on tiny dummy inputs so checkpoints are complete
    (parity: the reference's one nn.Module owns all submodules up front)."""
    c = model.cfg
    B, T, G = 1, c.data.max_text_len, c.data.max_insts
    images = jnp.zeros((B, H, W, 3), jnp.float32)
    img_mask = jnp.zeros((B, H, W), bool)
    sizes = jnp.array([[H, W]], jnp.int32)
    tids = jnp.zeros((B, T), jnp.int32)
    tmask = jnp.ones((B, T), jnp.int32)
    targets = {
        "boxes": jnp.tile(jnp.array([[[0.5, 0.5, 0.2, 0.2]]]), (B, G, 1)),
        "valid": jnp.ones((B, G), bool),
        "positive_map": jnp.ones((B, G, T), bool),
        "masks": jnp.zeros((B, G, H // 4, W // 4), jnp.float32),
        "has_masks": True,
    }

    def all_paths(mod):
        losses = mod(images, img_mask, sizes, tids, tmask, task="detection",
                     targets=targets, train=True)
        ts = c.sot.template_size
        nch = 4 if c.sot.extra_backbone_for_template else 3
        lang = mod.encode_template(jnp.zeros((B, ts, ts, nch), jnp.float32))
        if c.use_reid:
            # full reid path so USE_DEFORMABLE_REID_HEAD params exist
            d = c.transformer.d_model
            L = c.transformer.num_feature_levels
            ss = tuple((4, 4) for _ in range(L))
            S = sum(h * w for h, w in ss)
            _ = mod.compute_reid(
                jnp.zeros((B, 4, d)),
                jnp.full((B, 4, 4), 0.5),
                jnp.zeros((B, S, d)), ss,
                jnp.zeros((B, S), bool),
                jnp.ones((B, L, 2)))
        return losses

    # jitted: eager flax init dispatches thousands of ops one-by-one, which
    # is pathological through a high-latency device tunnel (and slow on CPU)
    return jax.jit(lambda rngs: model.init(rngs, method=all_paths))(
        {"params": rng, "dn": jax.random.fold_in(rng, 1),
         "droppath": jax.random.fold_in(rng, 7)})


class UninextDETR(nn.Module):
    cfg: UninextConfig

    def setup(self):
        c = self.cfg
        t = c.transformer
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self.compute_dtype = dtype

        def build_backbone(in_channels, name):
            if c.backbone.name == "resnet50":
                return ResNet(depth=50, in_channels=in_channels,
                              dtype=dtype, name=name)
            elif c.backbone.name == "convnext_large":
                from .convnext import ConvNeXt
                return ConvNeXt(
                    depths=c.backbone.convnext_depths,
                    dims=c.backbone.convnext_dims,
                    drop_path_rate=c.backbone.drop_path_rate,
                    in_channels=in_channels,
                    dtype=dtype, name=name)
            elif c.backbone.name == "vit_huge":
                from .vit import ViT
                return ViT(
                    patch_size=c.backbone.vit_patch_size,
                    embed_dim=c.backbone.vit_embed_dim,
                    depth=c.backbone.vit_depth,
                    num_heads=c.backbone.vit_num_heads,
                    window_size=c.backbone.vit_window_size,
                    global_blocks=c.backbone.vit_global_blocks,
                    drop_path_rate=c.backbone.vit_drop_path_rate,
                    global_q_chunk_rows=c.backbone.vit_global_q_rows,
                    use_flash=c.backbone.vit_flash_attn,
                    remat_blocks=c.backbone.vit_use_checkpoint,
                    in_channels=in_channels,
                    dtype=dtype, name=name)
            else:
                raise NotImplementedError(c.backbone.name)

        self.backbone = build_backbone(c.backbone.in_channels, "backbone")

        n_backbone = len(c.backbone.out_channels)
        projs = []
        for i in range(t.num_feature_levels):
            if i < n_backbone:
                projs.append(nn.Conv(t.d_model, (1, 1), dtype=dtype,
                                     kernel_init=nn.initializers.xavier_uniform(),
                                     name=f"input_proj_{i}"))
            else:
                projs.append(nn.Conv(t.d_model, (3, 3), strides=(2, 2),
                                     padding=1, dtype=dtype,
                                     kernel_init=nn.initializers.xavier_uniform(),
                                     name=f"input_proj_{i}"))
        self.input_proj = projs
        self.input_norm = [nn.GroupNorm(num_groups=32, name=f"input_gn_{i}")
                           for i in range(t.num_feature_levels)]

        self.bert = BertEncoder(c.language, dtype=dtype, name="bert")
        self.transformer = UninextTransformer(t, c.language, dtype=dtype,
                                              remat=c.remat_encoder,
                                              scan_encoder=c.scan_encoder,
                                              name="transformer")
        self.class_embeds = [VLAlign(t, lang_dim=c.language.hidden_dim,
                                     name=f"class_embed_{i}")
                             for i in range(t.dec_layers)]
        self.enc_class_embed = (StillClassifier(name="enc_class_embed")
                                if t.still_cls_for_encoder else
                                VLAlign(t, lang_dim=c.language.hidden_dim,
                                        name="enc_class_embed"))
        self.bbox_embeds = [
            MLP(t.d_model, 4, 3, final_kernel_init=nn.initializers.zeros,
                final_bias_init=nn.initializers.zeros, name=f"bbox_embed_{i}")
            for i in range(t.dec_layers + 1)]
        if t.use_iou_branch:
            bias_value = -math.log((1 - 0.01) / 0.01)
            self.iou_heads = [
                nn.Dense(1, bias_init=nn.initializers.constant(bias_value),
                         name=f"iou_head_{i}") for i in range(t.dec_layers)]
        if c.mask_head.enabled:
            self.controller = MLP(t.d_model,
                                  num_gen_params(c.mask_head, t.d_model // 32),
                                  3, name="controller")
            self.mask_head = MaskHeadSmallConv(t.d_model, dtype=dtype,
                                               name="mask_head")
        self.dn_resizer = FeatureResizer(t.d_model, name="dn_resizer")
        if c.use_reid:
            self.reid_embed = MLP(t.d_model, t.d_model, c.reid_layers,
                                  name="reid_embed")
            if c.use_deformable_reid:
                # reference DeformableReidHead (deformable_transformer_dino.py
                # :504-528): a small deformable decoder before the reid MLP
                from .transformer import DecoderLayer
                self.reid_dec_layers = [
                    DecoderLayer(t, dtype=dtype, name=f"reid_dec_{i}")
                    for i in range(c.n_layer_deformable_reid)]
                self.reid_ref_point_head = MLP(t.d_model, t.d_model, 2,
                                               name="reid_ref_point_head")
        # SOT/VOS: template tokens -> language-dim pseudo-prompt
        # (reference ddetrs_vid.py:37 adjust_layer 256->768)
        self.adjust_layer = nn.Dense(c.language.hidden_dim,
                                     name="adjust_layer")
        if c.sot.extra_backbone_for_template:
            # the reference builds the template branch from the SAME backbone
            # family with 4 input channels (uninext_vid.py:160-167
            # MaskedBackbone(cfg, ShapeSpec(channels=4)) — a 4ch ViT for the
            # ViT-H config, 4ch ResNet for R50)
            self.template_backbone = build_backbone(4, "template_backbone")
        if c.sot.feature_fusion:
            from .sot import FeatureFuser
            self.sot_fuser = FeatureFuser(t.d_model, dtype=dtype,
                                          name="sot_fuser")

    # ------------------------------------------------------------------
    def encode_template(self, template_images: jnp.ndarray,
                        template_pad_mask: Optional[jnp.ndarray] = None
                        ) -> Dict:
        """Template crops -> pseudo-language prompt.

        template_images: (B, S, S, 3|4) normalized crops; template_pad_mask:
        optional (B, S, S) True = crop padding (from models/sot.py
        crop_template). Parity with ddetrs_vid_dn.py coco_inference_ref
        :497-545: without FEAT_FUSE, each level is NEAREST-resized to
        ref_feat_size^2 and concatenated (L*r*r tokens); with FEAT_FUSE
        (the video flagship) the fused P3-P6 map is flattened at FULL
        stride-8 resolution. Prompt masks come from the nearest-downsampled
        crop pad mask (~masks semantics), not all-ones."""
        from .sot import resize_level
        c = self.cfg
        t = c.transformer
        B, S = template_images.shape[:2]
        if c.sot.extra_backbone_for_template and template_images.shape[-1] == 4:
            feats = self._backbone_feats(self.template_backbone,
                                         template_images, train=False)
        else:
            feats = self._backbone_feats(self.backbone, template_images,
                                         train=False)
        level_feats = [feats[f"res{i+3}"]
                       for i in range(len(c.backbone.out_channels))]
        if template_pad_mask is None:
            template_pad_mask = jnp.zeros((B, S, S), bool)
        levels, lmasks = [], []
        r = c.sot.ref_feat_size
        for i in range(t.num_feature_levels):
            if i < len(level_feats):
                x = self.input_norm[i](self.input_proj[i](level_feats[i]))
            elif i == len(level_feats):
                x = self.input_norm[i](self.input_proj[i](level_feats[-1]))
            else:
                x = self.input_norm[i](self.input_proj[i](prev))
            prev = x
            levels.append(x)
            lmasks.append(_downsample_mask(template_pad_mask,
                                           (x.shape[1], x.shape[2])))
        if c.sot.feature_fusion:
            # SOT.FEAT_FUSE: fuse P3-P6 into one stride-8 map and keep EVERY
            # token (the reference flattens the full map, :530-532)
            fused = self.sot_fuser(levels)
            tok = fused.reshape(B, -1, t.d_model)
            pad = lmasks[0].reshape(B, -1)
        else:
            tokens = [resize_level(x, r).reshape(B, r * r, t.d_model)
                      for x in levels]
            tok = jnp.concatenate(tokens, axis=1)        # (B, L*r*r, 256)
            pad = jnp.concatenate(
                [resize_level(m[..., None].astype(jnp.float32), r)
                 .reshape(B, r * r) > 0 for m in lmasks], axis=1)
        hidden = self.adjust_layer(tok.astype(jnp.float32))
        masks = (~pad).astype(jnp.int32)
        return {"hidden": hidden, "masks": masks,
                "aggregate": agg_lang_feat(hidden, masks)}

    def encode_text(self, text_ids, text_mask):
        out = self.bert(text_ids, text_mask)
        if self.cfg.language.freeze:
            out = jax.tree.map(jax.lax.stop_gradient, out)
        return out

    def _backbone_feats(self, bb, images, train: bool):
        """Run a backbone; ConvNeXt/ViT take a deterministic flag (drop-path
        active only in training), frozen-BN ResNet does not."""
        if self.cfg.backbone.name == "resnet50":
            return bb(images)
        return bb(images, deterministic=not train)

    def encode_image(self, images, img_mask, train: bool = False):
        """images: (B, H, W, 3) normalized; img_mask: (B, H, W) True=pad."""
        c = self.cfg
        t = c.transformer
        feats = self._backbone_feats(self.backbone, images, train)
        level_feats = [feats[f"res{i+3}"] for i in range(len(c.backbone.out_channels))]
        srcs, masks, poses = [], [], []
        for i in range(t.num_feature_levels):
            if i < len(level_feats):
                x = self.input_norm[i](self.input_proj[i](level_feats[i]))
            elif i == len(level_feats):
                x = self.input_norm[i](self.input_proj[i](level_feats[-1]))
            else:
                x = self.input_norm[i](self.input_proj[i](srcs[-1]))
            m = _downsample_mask(img_mask, (x.shape[1], x.shape[2]))
            srcs.append(x)
            masks.append(m)
            poses.append(position_embedding_sine(m, t.d_model // 2,
                                                 dtype=self.compute_dtype))
        return srcs, masks, poses

    # ------------------------------------------------------------------
    def _decode_outputs(self, trans, task, lang_mask):
        """Per-layer classification/box/iou from decoder states."""
        t = self.cfg.transformer
        hs = trans["hs"]
        lang_hidden = trans["lang_hidden"]
        lang_pool = agg_lang_feat(lang_hidden, lang_mask)[:, None]
        logits_layers, boxes_layers, iou_layers = [], [], []
        for lvl in range(t.dec_layers):
            base = (trans["init_reference"] if lvl == 0
                    else trans["inter_references"][lvl - 1])
            if task == "grounding":
                logits = self.class_embeds[lvl](hs[lvl], lang_pool)
            else:
                logits = self.class_embeds[lvl](hs[lvl], lang_hidden)
            delta = self.bbox_embeds[lvl](hs[lvl]).astype(jnp.float32)
            coords = jax.nn.sigmoid(delta + inverse_sigmoid(base))
            logits_layers.append(logits)
            boxes_layers.append(coords)
            if t.use_iou_branch:
                iou_layers.append(self.iou_heads[lvl](hs[lvl].astype(jnp.float32)))
        return logits_layers, boxes_layers, iou_layers, lang_pool

    def _mask_feats(self, memory, spatial_shapes):
        """Decode encoder memory into stride-8 mask features (shared across
        decoder layers — the reference recomputes this per layer on identical
        inputs; hoisting is numerically identical and 6x cheaper)."""
        B = memory.shape[0]
        d = self.cfg.transformer.d_model
        feats = []
        start = 0
        for (H, W) in spatial_shapes[:3]:
            feats.append(memory[:, start:start + H * W].reshape(B, H, W, d))
            start += H * W
        return self.mask_head(feats)

    # ------------------------------------------------------------------
    def __call__(self, images, img_mask, image_sizes, text_ids, text_mask,
                 task: str = "detection", targets: Optional[Dict] = None,
                 train: bool = False, lang_dict: Optional[Dict] = None):
        """Unified forward.

        images: (B, H, W, 3) normalized+padded; img_mask: (B, H, W) True=pad;
        image_sizes: (B, 2) valid (h, w) per image; text_ids/text_mask:
        (B, T); targets (train only): dict with
            boxes (B, G, 4) cxcywh normalized, valid (B, G),
            positive_map (B, G, T) bool, masks optional (B, G, H/4, W/4),
            has_masks: static bool.
        """
        c = self.cfg
        t = c.transformer
        # SOT/VOS pass template pseudo-language via lang_dict (reference
        # "template tokens as language", ddetrs_vid.py:503)
        lang = lang_dict if lang_dict is not None else self.encode_text(
            text_ids, text_mask)
        srcs, masks, poses = self.encode_image(images, img_mask, train=train)
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)

        # DINO denoising queries (training only)
        dn_tgt = dn_ref = None
        attn_mask = None
        dn_q2g = None
        use_dn = train and t.use_dino and t.dn_number > 0 and targets is not None
        if use_dn:
            lang_pool0 = agg_lang_feat(lang["hidden"], lang["masks"])
            label_enc = self.dn_resizer(lang_pool0)
            rng = self.make_rng("dn")
            single_pad = min(DN_SINGLE_PAD, c.data.max_insts)
            dn_tgt, dn_ref, dn_q2g = prepare_dn_static(
                targets["boxes"], targets["valid"], label_enc, rng,
                t.box_noise_scale, single_pad=single_pad)
            attn_mask = jnp.asarray(
                build_dn_attn_mask(t.num_queries, single_pad=single_pad))

        trans = self.transformer(
            srcs, masks, poses, lang["hidden"], lang["masks"], task,
            enc_class_head=self.enc_class_embed,
            enc_bbox_head=self.bbox_embeds[t.dec_layers],
            bbox_heads=self.bbox_embeds[:t.dec_layers],
            dn_tgt=dn_tgt, dn_refpoints_unact=dn_ref, attn_mask=attn_mask)

        logits_l, boxes_l, iou_l, lang_pool = self._decode_outputs(
            trans, task, lang["masks"])

        pad = dn_tgt.shape[1] if use_dn else 0
        outputs = {
            "spatial_shapes": spatial_shapes,
            "memory": trans["memory"],
            "enc_class": trans["enc_class"],
            "enc_coord_unact": trans["enc_coord_unact"],
            "lang_hidden": trans["lang_hidden"],
            "lang_pool": lang_pool,
            # deformable reid head inputs (reference src_info +
            # inter_references[-1], ddetrs_dn.py:388-391)
            "final_reference": trans["inter_references"][-1][:, pad:],
            "mask_flatten": trans["mask_flatten"],
            "valid_ratios": trans["valid_ratios"],
        }
        # split dn part from matching part
        outputs["layers"] = []
        for lvl in range(t.dec_layers):
            layer = {
                "pred_logits": logits_l[lvl][:, pad:],
                "pred_boxes": boxes_l[lvl][:, pad:],
                "hs": trans["hs"][lvl][:, pad:],
                "base_reference": (trans["init_reference"] if lvl == 0 else
                                   trans["inter_references"][lvl - 1])[:, pad:],
            }
            if t.use_iou_branch:
                layer["pred_boxious"] = iou_l[lvl][:, pad:]
            if use_dn:
                layer["dn_logits"] = logits_l[lvl][:, :pad]
                layer["dn_boxes"] = boxes_l[lvl][:, :pad]
            outputs["layers"].append(layer)
        if use_dn:
            outputs["dn_q2g"] = dn_q2g

        if train:
            return self.compute_losses(outputs, targets, task, lang["masks"],
                                       image_sizes)
        return self.inference_outputs(outputs, task, lang["masks"], image_sizes)

    # ------------------------------------------------------------------
    def compute_losses(self, outputs, targets, task, lang_mask, image_sizes):
        """Per-layer matching + losses. Parity: ddetrs.py coco_forward
        :152-224 and SetCriterion/DINOCriterion."""
        c = self.cfg
        t = c.transformer
        lcfg = c.loss
        gt_boxes = targets["boxes"]
        gt_valid = targets["valid"]
        if task == "grounding":
            positive_map = jnp.ones(
                (*gt_valid.shape, 1), bool) & gt_valid[..., None]
            text_mask_loss = jnp.ones((gt_valid.shape[0], 1), jnp.float32)
        else:
            positive_map = targets["positive_map"] & gt_valid[..., None]
            text_mask_loss = lang_mask.astype(jnp.float32)

        num_boxes_global = jnp.maximum(gt_valid.sum().astype(jnp.float32), 1.0)
        has_masks = bool(targets.get("has_masks", False))

        mask_feats = (self._mask_feats(outputs["memory"],
                                       outputs["spatial_shapes"])
                      if c.mask_head.enabled and has_masks else None)

        losses: Dict[str, jnp.ndarray] = {}
        suffix = lambda lvl: "" if lvl == t.dec_layers - 1 else f"_{lvl}"

        # ---- decoder-layer losses: ONE vmapped body over the layer axis ----
        # (compiling one copy of matching+losses instead of dec_layers copies
        # cuts train-graph compile time substantially)
        layers = outputs["layers"]
        stack = lambda k: jnp.stack([l[k] for l in layers])
        logits_s = stack("pred_logits")
        boxes_s = stack("pred_boxes")
        base_s = stack("base_reference")
        iou_s = stack("pred_boxious") if t.use_iou_branch else None
        ctrl_s = (self.controller(stack("hs"))
                  if mask_feats is not None else None)
        mask_feats_f = (mask_feats.astype(jnp.float32)
                        if mask_feats is not None else None)

        def per_layer(logits, boxes, base_ref, iou_pred, ctrl):
            out: Dict[str, jnp.ndarray] = {}
            sg_logits = jax.lax.stop_gradient(logits)
            sg_boxes = jax.lax.stop_gradient(boxes)
            if lcfg.ota:
                cost, iou = jax.vmap(ota_cost_and_iou, (0, 0, 0, 0, 0))(
                    sg_logits, sg_boxes, positive_map, gt_boxes, gt_valid)
                q2g, _ = jax.vmap(simota_match)(cost, iou, gt_valid)
            else:
                cost = jax.vmap(vl_cost_matrix,
                                (0, 0, 0, 0, 0, None, None, None))(
                    sg_logits, sg_boxes, positive_map, gt_boxes, gt_valid,
                    lcfg.set_cost_class, lcfg.set_cost_box,
                    lcfg.set_cost_giou)
                q2g = jax.vmap(hungarian_match)(cost, gt_valid)

            n_matched = jnp.maximum((q2g >= 0).sum().astype(jnp.float32), 1.0)
            num_boxes = n_matched if lcfg.ota else num_boxes_global
            out["loss_ce"] = crit.loss_labels_vl(
                logits, positive_map, q2g, text_mask_loss, num_boxes, lcfg)
            box_losses = crit.loss_boxes(boxes, gt_boxes, q2g, num_boxes,
                                         iou_pred)
            out["loss_bbox"] = box_losses["loss_bbox"]
            out["loss_giou"] = box_losses["loss_giou"]
            if "loss_boxiou" in box_losses:
                out["loss_boxiou"] = box_losses["loss_boxiou"]

            if mask_feats_f is not None:
                sel_q, sel_valid = select_matched(q2g, c.mask_head.max_insts)
                params = jnp.take_along_axis(ctrl, sel_q[..., None], axis=1)
                bref = jnp.take_along_axis(base_ref, sel_q[..., None], axis=1)
                scale = image_sizes[:, None, ::-1].astype(jnp.float32)
                centers = bref[..., :2] * scale
                mask_logits = dynamic_mask_forward(
                    mask_feats_f, centers, params, c.mask_head)
                tgt_g = jnp.take_along_axis(q2g, sel_q, axis=1)
                if lcfg.boxinst:
                    bitmasks = crit.gather_by_match(
                        targets["box_bitmasks"].astype(jnp.float32), tgt_g)
                    warmup = jnp.clip(
                        targets.get("step", jnp.int32(0)).astype(jnp.float32)
                        / lcfg.boxinst_warmup_iters, 0.0, 1.0)
                    m_losses = crit.loss_masks_boxinst(
                        mask_logits, bitmasks, targets["color_similarity"],
                        sel_valid, warmup,
                        lcfg.boxinst_pairwise_color_thresh,
                        lcfg.boxinst_pairwise_size,
                        lcfg.boxinst_pairwise_dilation)
                    out["loss_prj"] = m_losses["loss_prj"]
                    out["loss_pairwise"] = m_losses["loss_pairwise"]
                else:
                    tgt_masks = crit.gather_by_match(
                        targets["masks"].astype(jnp.float32), tgt_g)
                    m_losses = crit.loss_masks(
                        mask_logits, tgt_masks, sel_valid, num_boxes, lcfg)
                    out["loss_mask"] = m_losses["loss_mask"]
                    out["loss_dice"] = m_losses["loss_dice"]
            return out

        per_layer_losses = jax.vmap(per_layer, in_axes=(0, 0, 0,
                                                        0 if iou_s is not None else None,
                                                        0 if ctrl_s is not None else None))(
            logits_s, boxes_s, base_s, iou_s, ctrl_s)
        for key, vals in per_layer_losses.items():
            for lvl in range(t.dec_layers):
                losses[f"{key}{suffix(lvl)}"] = vals[lvl]

        # ---- encoder (binary) losses: Hungarian on all positions ----
        enc_logits = outputs["enc_class"]                       # (B, S, 1)
        enc_boxes = jax.nn.sigmoid(outputs["enc_coord_unact"])  # (B, S, 4)
        bin_pm = jnp.ones((*gt_valid.shape, 1), bool) & gt_valid[..., None]
        enc_cost = jax.vmap(vl_cost_matrix, (0, 0, 0, 0, 0, None, None, None))(
            jax.lax.stop_gradient(enc_logits), jax.lax.stop_gradient(enc_boxes),
            bin_pm, gt_boxes, gt_valid,
            lcfg.set_cost_class, lcfg.set_cost_box, lcfg.set_cost_giou)
        enc_q2g = jax.vmap(hungarian_match)(enc_cost, gt_valid)
        losses["loss_ce_enc"] = crit.loss_labels_vl(
            enc_logits, bin_pm, enc_q2g, None, num_boxes_global, lcfg)
        enc_box_losses = crit.loss_boxes(enc_boxes, gt_boxes, enc_q2g,
                                         num_boxes_global)
        losses["loss_bbox_enc"] = enc_box_losses["loss_bbox"]
        losses["loss_giou_enc"] = enc_box_losses["loss_giou"]

        # ---- dn losses (vmapped over the layer axis) ----
        if "dn_q2g" in outputs:
            dn_q2g = outputs["dn_q2g"]
            dn_num_boxes = num_boxes_global * DN_GROUPS
            dn_logits_s = stack("dn_logits")
            dn_boxes_s = stack("dn_boxes")

            def dn_layer(dl, db):
                ce = crit.loss_labels_vl(dl, positive_map, dn_q2g,
                                         text_mask_loss, dn_num_boxes, lcfg)
                bx = crit.loss_boxes(db, gt_boxes, dn_q2g, dn_num_boxes)
                return ce, bx["loss_bbox"], bx["loss_giou"]

            ce_s, bbox_s, giou_s = jax.vmap(dn_layer)(dn_logits_s, dn_boxes_s)
            for lvl in range(t.dec_layers):
                losses[f"loss_ce_dn{suffix(lvl)}"] = ce_s[lvl]
                losses[f"loss_bbox_dn{suffix(lvl)}"] = bbox_s[lvl]
                losses[f"loss_giou_dn{suffix(lvl)}"] = giou_s[lvl]

        return losses

    # ------------------------------------------------------------------
    def forward_video_train(self, images_key, img_mask, image_sizes,
                            text_ids, text_mask, targets_key, targets_ref,
                            images_ref, task: str = "detection"):
        """Two-frame (key, ref) VIS/MOT training step.

        Parity: DDETRSegmUniVID.coco_forward_vis (ddetrs_vid.py:526-720) —
        backbone over the concatenated clip, separate transformer passes for
        key/ref, full detection losses on the key frame, contrastive reid
        loss between key-matched queries and ref-frame queries. Instance
        correspondence: slot i of targets_key and targets_ref is the same
        object (per-slot validity masks handle appearance/disappearance).
        """
        assert self.cfg.use_reid, "video training requires use_reid=True"
        c = self.cfg
        t = c.transformer
        lcfg = c.loss
        B = images_key.shape[0]
        lang = self.encode_text(text_ids, text_mask)

        # one backbone pass over the 2B clip (bigger batch -> better MXU use)
        images = jnp.concatenate([images_key, images_ref], 0)
        masks2 = jnp.concatenate([img_mask, img_mask], 0)
        srcs, masks, poses = self.encode_image(images, masks2, train=True)
        split = lambda xs: ([x[:B] for x in xs], [x[B:] for x in xs])
        srcs_k, srcs_r = split(srcs)
        masks_k, masks_r = split(masks)
        poses_k, poses_r = split(poses)

        common = dict(enc_class_head=self.enc_class_embed,
                      enc_bbox_head=self.bbox_embeds[t.dec_layers],
                      bbox_heads=self.bbox_embeds[:t.dec_layers])
        trans_k = self.transformer(srcs_k, masks_k, poses_k, lang["hidden"],
                                   lang["masks"], task, **common)
        trans_r = self.transformer(srcs_r, masks_r, poses_r, lang["hidden"],
                                   lang["masks"], task, **common)

        logits_l, boxes_l, iou_l, lang_pool = self._decode_outputs(
            trans_k, task, lang["masks"])
        outputs = {
            "spatial_shapes": tuple((s.shape[1], s.shape[2]) for s in srcs_k),
            "memory": trans_k["memory"],
            "enc_class": trans_k["enc_class"],
            "enc_coord_unact": trans_k["enc_coord_unact"],
            "layers": [
                dict(pred_logits=logits_l[lvl], pred_boxes=boxes_l[lvl],
                     hs=trans_k["hs"][lvl],
                     base_reference=(trans_k["init_reference"] if lvl == 0
                                     else trans_k["inter_references"][lvl - 1]),
                     **({"pred_boxious": iou_l[lvl]} if t.use_iou_branch else {}))
                for lvl in range(t.dec_layers)],
        }
        losses = self.compute_losses(outputs, targets_key, task,
                                     lang["masks"], image_sizes)

        # ---- reid: contrastive key->ref (last decoder layer only) ----
        gt_valid_k = targets_key["valid"]
        gt_valid_r = targets_ref["valid"]
        if task == "grounding":
            pm_r = jnp.ones((*gt_valid_r.shape, 1), bool) & gt_valid_r[..., None]
            ref_cls = self.class_embeds[-1](trans_r["hs"][-1],
                                            agg_lang_feat(trans_r["lang_hidden"],
                                                          lang["masks"])[:, None])
            pm_k = jnp.ones((*gt_valid_k.shape, 1), bool) & gt_valid_k[..., None]
        else:
            pm_r = targets_ref["positive_map"] & gt_valid_r[..., None]
            ref_cls = self.class_embeds[-1](trans_r["hs"][-1],
                                            trans_r["lang_hidden"])
            pm_k = targets_key["positive_map"] & gt_valid_k[..., None]

        # key-frame best query per gt (last layer OTA)
        k_logits = jax.lax.stop_gradient(logits_l[-1])
        k_boxes = jax.lax.stop_gradient(boxes_l[-1])
        cost_k, iou_k = jax.vmap(ota_cost_and_iou, (0, 0, 0, 0, 0))(
            k_logits, k_boxes, pm_k, targets_key["boxes"], gt_valid_k)
        _, g2q_key = jax.vmap(simota_match)(cost_k, iou_k, gt_valid_k)

        # ref-frame pos (k=10) and exclusion (k=100) sets
        r_boxes = jax.lax.stop_gradient(trans_r["inter_references"][-1])
        r_logits = jax.lax.stop_gradient(ref_cls)
        cost_r, iou_r = jax.vmap(ota_cost_and_iou, (0, 0, 0, 0, 0))(
            r_logits, r_boxes, pm_r, targets_ref["boxes"], gt_valid_r)
        q2g_pos, _ = jax.vmap(simota_match, (0, 0, 0, None))(
            cost_r, iou_r, gt_valid_r, 10)
        q2g_wide, _ = jax.vmap(simota_match, (0, 0, 0, None))(
            cost_r, iou_r, gt_valid_r, 100)

        shapes_k = tuple((s.shape[1], s.shape[2]) for s in srcs_k)
        key_embeds = self.compute_reid(
            trans_k["hs"][-1], trans_k["inter_references"][-1],
            trans_k["memory"], shapes_k, trans_k["mask_flatten"],
            trans_k["valid_ratios"])                          # (B, Q, C)
        ref_embeds = self.compute_reid(
            trans_r["hs"][-1], trans_r["inter_references"][-1],
            trans_r["memory"], shapes_k, trans_r["mask_flatten"],
            trans_r["valid_ratios"])
        G = gt_valid_k.shape[1]
        Q = key_embeds.shape[1]
        g_idx = jnp.arange(G)[None, :, None]                  # (1, G, 1)
        is_pos = q2g_pos[:, None, :] == g_idx                 # (B, G, Q)
        in_wide = q2g_wide[:, None, :] == g_idx
        labels3 = jnp.where(is_pos, 1, jnp.where(in_wide, -1, 0))
        key_sel = jnp.take_along_axis(key_embeds, jnp.clip(g2q_key, 0)[..., None],
                                      axis=1)                 # (B, G, C)
        contrast = jnp.einsum("bgc,bqc->bgq", key_sel, ref_embeds)
        norm = lambda x: x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
        cos = jnp.einsum("bgc,bqc->bgq", norm(key_sel), norm(ref_embeds))
        # rows valid only where the key gt exists AND also exists in ref frame
        row_valid = (gt_valid_k & gt_valid_r).astype(jnp.float32)
        reid_losses = crit.loss_reid_static(
            contrast.reshape(B * G, Q), labels3.reshape(B * G, Q),
            row_valid.reshape(B * G), cos.reshape(B * G, Q))
        losses.update(reid_losses)
        return losses

    def forward_sot_train(self, images_key, img_mask, image_sizes,
                          targets_key, targets_ref, images_ref):
        """SOT/VOS stage-3 training: the ref frame contributes ONLY a
        template crop around its gt box, encoded as the pseudo-language
        prompt for a standard grounding-style detection pass on the key
        frame. No reid loss. Parity: DDETRSegmUniVID.coco_forward_sot
        (ddetrs_vid.py:197-270 — template via get_template(_4c), pooled
        template feature as classifier, full per-layer matching + losses).

        Assumes key/ref share a clip-consistent resolution (the SOT video
        mappers guarantee it); the template box is the FIRST valid ref slot.
        """
        from .sot import crop_template
        c = self.cfg
        B, G = targets_ref["valid"].shape
        idx = jnp.argmax(targets_ref["valid"].astype(jnp.int32), axis=1)
        box_n = jnp.take_along_axis(
            targets_ref["boxes"], idx[:, None, None], axis=1)[:, 0]  # cxcywh
        hw = image_sizes.astype(jnp.float32)                  # (B, 2) (h, w)
        w, h = hw[:, 1], hw[:, 0]
        box_xyxy = jnp.stack(
            [(box_n[:, 0] - box_n[:, 2] / 2) * w,
             (box_n[:, 1] - box_n[:, 3] / 2) * h,
             (box_n[:, 0] + box_n[:, 2] / 2) * w,
             (box_n[:, 1] + box_n[:, 3] / 2) * h], axis=1)
        gm = None
        mask_channel = c.sot.extra_backbone_for_template
        if mask_channel and "masks" in targets_ref:
            m4 = jnp.take_along_axis(
                targets_ref["masks"], idx[:, None, None, None],
                axis=1)[:, 0]                                 # (B, H/4, W/4)
            gm = jnp.repeat(jnp.repeat(m4, 4, axis=1), 4, axis=2)
            gm = gm[:, :images_ref.shape[1], :images_ref.shape[2]]
        crop, pad = crop_template(
            images_ref, box_xyxy, c.sot.template_size,
            c.sot.search_area_factor, gt_masks=gm, mask_channel=mask_channel,
            pad_masks=img_mask)
        lang = self.encode_template(crop, pad)
        dummy_ids = jnp.zeros((B, 1), jnp.int32)
        return self(images_key, img_mask, image_sizes, dummy_ids,
                    jnp.ones((B, 1), jnp.int32), task="grounding",
                    targets=targets_key, train=True, lang_dict=lang)

    # ------------------------------------------------------------------
    def inference_outputs(self, outputs, task, lang_mask, image_sizes):
        """Last-layer raw outputs for the task drivers (top-k/NMS/tracking
        run in the jitted postprocess or on host). Masks are computed lazily
        by `predict_masks` for selected queries only."""
        layer = outputs["layers"][-1]
        out = {
            "pred_logits": layer["pred_logits"],
            "pred_boxes": layer["pred_boxes"],
            "base_reference": layer["base_reference"],
            "hs": layer["hs"],
            "memory": outputs["memory"],
        }
        if self.cfg.transformer.use_iou_branch:
            out["pred_boxious"] = layer["pred_boxious"]
        if self.cfg.use_reid:
            # full reid path incl. the deformable reid decoder when
            # configured (reference inference: ddetrs_dn.py:449-457)
            out["pred_embeds"] = self.compute_reid(
                layer["hs"], outputs["final_reference"], outputs["memory"],
                outputs["spatial_shapes"], outputs["mask_flatten"],
                outputs["valid_ratios"])
        return out

    def compute_reid(self, hs, refs, memory=None, spatial_shapes=None,
                     mask_flatten=None, valid_ratios=None):
        """reid embeddings; optionally through the deformable reid decoder
        (USE_DEFORMABLE_REID_HEAD) with DETACH_REID semantics."""
        c = self.cfg
        x = jax.lax.stop_gradient(hs) if c.detach_reid else hs
        if c.use_deformable_reid and memory is not None:
            from .layers import get_sine_pos_embed
            refs = jax.lax.stop_gradient(refs)
            for layer in self.reid_dec_layers:
                ref_input = (refs[:, :, None]
                             * jnp.concatenate([valid_ratios] * 2, -1)[:, None])
                qpos = self.reid_ref_point_head(
                    get_sine_pos_embed(ref_input[:, :, 0, :])).astype(x.dtype)
                x = layer(x, qpos, ref_input, memory, spatial_shapes,
                          mask_flatten, None)
        return self.reid_embed(x)

    def predict_masks(self, memory, spatial_shapes, hs_sel, base_ref_sel,
                      image_sizes):
        """Mask logits for pre-selected queries.

        hs_sel: (B, K, C) decoder states of selected queries;
        base_ref_sel: (B, K, 4) their base reference points (sigmoided).
        Returns (B, K, H/4, W/4) logits."""
        mask_feats = self._mask_feats(memory, spatial_shapes)
        params = self.controller(hs_sel)
        scale = image_sizes[:, None, ::-1].astype(jnp.float32)
        centers = base_ref_sel[..., :2] * scale
        return dynamic_mask_forward(mask_feats.astype(jnp.float32), centers,
                                    params, self.cfg.mask_head)
