"""Deformable transformer with VL early fusion, two-stage proposals and DINO
query machinery — TPU-native re-design.

Parity anchors (reference):
  * DeformableTransformerVLDINO.forward — deformable_transformer_dino.py:174-275
  * DeformableTransformerEncoderVL      — :277-328 (per-layer VLFuse -> MSDA)
  * Encoder/Decoder layers              — :330-427
  * DeformableTransformerDecoder        — :438-503 (DAB-style sine query pos,
                                          box refinement, look-forward-twice)
  * gen_encoder_output_proposals        — :139-168
  * get_reference_points / valid ratios — :287-301, :169-176

TPU design notes:
  * All shapes static: spatial_shapes is a python tuple; images arrive padded
    to a resolution bucket, masks carry validity. No level_start_index tensor
    exists — level slicing is constant-folded.
  * Everything is expressed batched; the only sequential structure is the
    (unrolled) 6+6 layer stack.
  * Layer compute runs in `dtype` (bf16); softmaxes, sampling-offset math and
    box logits stay fp32 (mirroring the reference's fp32-forced custom ops).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import LanguageConfig, TransformerConfig
from ..utils.misc import agg_lang_feat, inverse_sigmoid
from .layers import (MLP, FeatureResizer, MSDeformAttnModule,
                     MultiHeadAttention, get_sine_pos_embed)
from .vl_fusion import VLFuse

# large finite stand-in for the reference's float('inf') proposal masking;
# sigmoid(1e5) == 1.0 in fp32 but avoids inf-arithmetic NaN hazards under AD
INVALID_LOGIT = 1e5


class EncoderLayer(nn.Module):
    cfg: TransformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, padding_mask):
        c = self.cfg
        attn = MSDeformAttnModule(
            d_model=c.d_model, n_levels=c.num_feature_levels, n_heads=c.nheads,
            n_points=c.enc_n_points, dtype=self.dtype, name="self_attn")(
                src + pos, reference_points, src, padding_mask, spatial_shapes)
        src = nn.LayerNorm(name="norm1")(src + attn)
        h = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        h = nn.Dense(c.d_model, dtype=self.dtype, name="linear2")(nn.relu(h))
        return nn.LayerNorm(name="norm2")(src + h)


class EncoderScanBody(nn.Module):
    """Scan-compatible wrapper: carry = visual tokens; pos/ref/mask broadcast.

    Compiling ONE layer body via nn.scan instead of 6 inlined copies cuts the
    dominant compile cost (each copy contains the full MSDA gather graph);
    spatial_shapes rides as a static attribute."""
    cfg: TransformerConfig
    spatial_shapes: Tuple[Tuple[int, int], ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, pos, reference_points, padding_mask):
        out = EncoderLayer(self.cfg, dtype=self.dtype, name="layer")(
            carry, pos, reference_points, self.spatial_shapes, padding_mask)
        return out, ()


class DecoderLayer(nn.Module):
    cfg: TransformerConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 src_padding_mask, attn_mask):
        c = self.cfg
        q = k = tgt + query_pos
        sa = MultiHeadAttention(c.d_model, c.nheads, dtype=self.dtype,
                                name="self_attn")(q, k, tgt, attn_mask)
        tgt = nn.LayerNorm(name="norm2")(tgt + sa)
        ca = MSDeformAttnModule(
            d_model=c.d_model, n_levels=c.num_feature_levels, n_heads=c.nheads,
            n_points=c.dec_n_points, dtype=self.dtype, name="cross_attn")(
                tgt + query_pos, reference_points, src, src_padding_mask,
                spatial_shapes)
        tgt = nn.LayerNorm(name="norm1")(tgt + ca)
        h = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        h = nn.Dense(c.d_model, dtype=self.dtype, name="linear2")(nn.relu(h))
        return nn.LayerNorm(name="norm3")(tgt + h)


def encoder_reference_points(spatial_shapes, valid_ratios):
    """All-level normalized pixel-center grid scaled by valid ratios.

    valid_ratios: (B, L, 2) (w, h) order. Returns (B, S, L, 2).
    """
    refs = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        ry = (jnp.arange(H, dtype=jnp.float32) + 0.5)
        rx = (jnp.arange(W, dtype=jnp.float32) + 0.5)
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        gy = gy.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * H)
        gx = gx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * W)
        refs.append(jnp.stack([gx, gy], -1))
    ref = jnp.concatenate(refs, 1)                      # (B, S, 2)
    return ref[:, :, None] * valid_ratios[:, None]      # (B, S, L, 2)


def compute_valid_ratios(masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """masks: per-level (B, H, W) bool True=padding -> (B, L, 2) (w, h)."""
    out = []
    for m in masks:
        H, W = m.shape[1], m.shape[2]
        valid_h = (~m[:, :, 0]).sum(1).astype(jnp.float32) / H
        valid_w = (~m[:, 0, :]).sum(1).astype(jnp.float32) / W
        out.append(jnp.stack([valid_w, valid_h], -1))
    return jnp.stack(out, 1)


def gen_encoder_output_proposals(memory, mask_flatten, spatial_shapes):
    """(memory zeroed at invalid slots, proposal logits filled at invalid).

    Parity: deformable_transformer_dino.py:139-168, with INVALID_LOGIT instead
    of inf. Returns (output_memory, output_proposals) BEFORE enc_output dense.
    """
    B = memory.shape[0]
    proposals = []
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        m = mask_flatten[:, start:start + H * W].reshape(B, H, W)
        valid_h = (~m[:, :, 0]).sum(1).astype(jnp.float32)   # (B,)
        valid_w = (~m[:, 0, :]).sum(1).astype(jnp.float32)
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], -1)[None]                  # (1, H, W, 2)
        scale = jnp.stack([valid_w, valid_h], -1).reshape(B, 1, 1, 2)
        grid = (grid + 0.5) / scale
        wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
        proposals.append(jnp.concatenate([grid, wh], -1).reshape(B, H * W, 4))
        start += H * W
    props = jnp.concatenate(proposals, 1)                     # (B, S, 4)
    valid = jnp.all((props > 0.01) & (props < 0.99), -1, keepdims=True)
    props = jnp.log(props / (1 - jnp.clip(props, None, 1 - 1e-7)))
    invalid = mask_flatten[..., None] | ~valid
    props = jnp.where(invalid, INVALID_LOGIT, props)
    out_memory = jnp.where(invalid, 0.0, memory)
    return out_memory, props


class UninextTransformer(nn.Module):
    """Encoder (VL fusion + MSDA) + two-stage proposals + DINO decoder.

    The per-layer class/bbox/iou heads are owned by the parent (UninextDETR)
    and passed in as callables so decoder box-refinement shares their params.
    """
    cfg: TransformerConfig
    lcfg: LanguageConfig
    dtype: Any = jnp.float32
    remat: bool = True
    # scan encoder layers (one compiled body, stacked params) — requires the
    # VL fusion to be hoisted before the stack, i.e. num_vl_layers <= 1
    scan_encoder: bool = True

    @nn.compact
    def __call__(self,
                 srcs: Sequence[jnp.ndarray],        # per level (B, H, W, C)
                 masks: Sequence[jnp.ndarray],       # per level (B, H, W) True=pad
                 pos_embeds: Sequence[jnp.ndarray],  # per level (B, H, W, C)
                 lang_hidden: jnp.ndarray,           # (B, L, 768)
                 lang_mask: jnp.ndarray,             # (B, L) 1=valid
                 task: str,
                 enc_class_head: Callable,           # (x, lang_pool) -> logits
                 enc_bbox_head: Callable,            # x -> (.., 4)
                 bbox_heads: Sequence[Callable],     # per decoder layer
                 dn_tgt: Optional[jnp.ndarray] = None,        # (B, Ndn, C)
                 dn_refpoints_unact: Optional[jnp.ndarray] = None,  # (B, Ndn, 4)
                 attn_mask: Optional[jnp.ndarray] = None):
        c = self.cfg
        B = srcs[0].shape[0]
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (c.num_feature_levels, c.d_model))
        # use_additional_bert threads lang_hidden through every layer, which
        # the scan body doesn't carry — take the unrolled path there
        use_scan = (self.scan_encoder and c.num_vl_layers <= 1
                    and c.enc_layers > 1 and not c.use_additional_bert)
        vl_layers = [
            VLFuse(c, self.lcfg, dtype=self.dtype, name=f"vl_layer_{i}")
            for i in range(min(c.num_vl_layers, c.enc_layers))
        ] if c.use_early_fusion else []
        lang_layers = []
        if c.use_additional_bert:
            # reference deformable_transformer.py:309-317: per encoder layer,
            # vl_layer -> deform layer -> lang_layer (a full clamped
            # bert-base layer on the 768-d language stream)
            from .bert import BertLayer
            lang_layers = [BertLayer(self.lcfg, dtype=self.dtype,
                                     name=f"lang_layer_{i}")
                           for i in range(c.enc_layers)]

        src_flatten = jnp.concatenate(
            [s.reshape(B, -1, c.d_model) for s in srcs], 1)
        mask_flatten = jnp.concatenate([m.reshape(B, -1) for m in masks], 1)
        pos_flatten = jnp.concatenate(
            [p.reshape(B, -1, c.d_model) + level_embed[l][None, None]
             for l, p in enumerate(pos_embeds)], 1)
        valid_ratios = compute_valid_ratios(masks)

        # ---- encoder with interleaved VL fusion (first num_vl_layers) ----
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        visual = src_flatten
        if c.sp_encoder:
            # sequence parallelism: queries shard over the "model" axis; the
            # value table is re-gathered by XLA where the sampling needs it
            from jax.sharding import PartitionSpec as P
            visual = jax.lax.with_sharding_constraint(
                visual, P("data", "model", None))
        if use_scan:
            if vl_layers:
                visual, lang_hidden = vl_layers[0](visual, lang_hidden,
                                                   lang_mask)
            body = EncoderScanBody
            if self.remat:
                body = nn.remat(body, prevent_cse=False)
            scan = nn.scan(body,
                           variable_axes={"params": 0},
                           split_rngs={"params": True},
                           in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                           length=c.enc_layers)
            visual, _ = scan(c, spatial_shapes, dtype=self.dtype,
                             name="encoder_scan")(
                visual, pos_flatten, enc_ref, mask_flatten)
        else:
            enc_cls = (nn.remat(EncoderLayer, static_argnums=(4,))
                       if self.remat else EncoderLayer)
            lang_bias = jnp.where(lang_mask[:, None, None, :] > 0,
                                  0.0, jnp.asarray(-1e9, self.dtype))
            for i in range(c.enc_layers):
                if i < len(vl_layers):
                    visual, lang_hidden = vl_layers[i](
                        visual, lang_hidden, lang_mask)
                visual = enc_cls(c, dtype=self.dtype,
                                 name=f"encoder_layer_{i}")(
                    visual, pos_flatten, enc_ref, spatial_shapes,
                    mask_flatten)
                if lang_layers:
                    lang_hidden = lang_layers[i](
                        lang_hidden.astype(self.dtype), lang_bias)
        memory = visual

        # pooled language feature (after fusion)
        lang_pool = agg_lang_feat(lang_hidden, lang_mask)      # (B, 768)
        ref_feat = FeatureResizer(c.d_model, name="resizer")(
            lang_pool)[:, None]                                # (B, 1, 256)

        # ---- two-stage proposal generation ----
        out_memory, out_proposals = gen_encoder_output_proposals(
            memory, mask_flatten, spatial_shapes)
        out_memory = nn.LayerNorm(name="enc_output_norm")(
            nn.Dense(c.d_model, name="enc_output")(out_memory))
        enc_class = enc_class_head(out_memory, lang_pool[:, None])
        enc_coord_unact = (enc_bbox_head(out_memory).astype(jnp.float32)
                           + out_proposals)
        # guard tiny inputs: fewer encoder tokens than proposals -> tile
        topk = min(c.num_queries, enc_class.shape[1])
        topk_idx = jax.lax.top_k(enc_class[..., 0], topk)[1]   # (B, topk)
        if topk < c.num_queries:
            reps = -(-c.num_queries // topk)
            topk_idx = jnp.tile(topk_idx, (1, reps))[:, :c.num_queries]
        topk_coords_unact = jnp.take_along_axis(
            enc_coord_unact, topk_idx[..., None], axis=1)      # (B, Q, 4)
        reference_points = jax.nn.sigmoid(
            jax.lax.stop_gradient(topk_coords_unact))
        if dn_refpoints_unact is not None:
            reference_points = jnp.concatenate(
                [jax.nn.sigmoid(dn_refpoints_unact), reference_points], 1)
        init_reference = reference_points

        # mixed query selection: learnable content queries
        tgt_embed = self.param("tgt_embed_weight",
                               nn.initializers.normal(1.0),
                               (c.num_queries, c.d_model))
        tgt = jnp.tile(tgt_embed[None], (B, 1, 1))
        if dn_tgt is not None:
            tgt = jnp.concatenate([dn_tgt, tgt], 1)
        # decoupled tgt (reference :243-255): still tgt for both tasks, keep
        # ref_feat on the graph with a zero-weight residual
        if c.decouple_tgt:
            if c.still_tgt_for_both or task == "detection":
                tgt = tgt + 0.0 * ref_feat
            elif task == "grounding":
                tgt = ref_feat + 0.0 * tgt
        else:
            tgt = jnp.tile(ref_feat, (1, tgt.shape[1], 1))

        # ---- decoder with DAB sine query pos + box refinement ----
        tgt = tgt.astype(self.dtype)
        intermediate = []
        intermediate_refs = []
        ref_point_head = MLP(c.d_model, c.d_model, 2, name="ref_point_head")
        for lid in range(c.dec_layers):
            ref_input = (reference_points[:, :, None]
                         * jnp.concatenate([valid_ratios] * 2, -1)[:, None])
            query_sine = get_sine_pos_embed(ref_input[:, :, 0, :])
            query_pos = ref_point_head(query_sine).astype(self.dtype)
            tgt = DecoderLayer(c, dtype=self.dtype,
                               name=f"decoder_layer_{lid}")(
                tgt, query_pos, ref_input, memory, spatial_shapes,
                mask_flatten, attn_mask)
            delta = bbox_heads[lid](tgt).astype(jnp.float32)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
            reference_points = jax.lax.stop_gradient(new_ref)
            intermediate.append(tgt)
            intermediate_refs.append(
                new_ref if c.look_forward_twice else reference_points)

        hs = jnp.stack(intermediate)                      # (n_dec, B, Q+, C)
        inter_references = jnp.stack(intermediate_refs)   # (n_dec, B, Q+, 4)
        return {
            "hs": hs,
            "memory": memory,
            "init_reference": init_reference,
            "inter_references": inter_references,
            "enc_class": enc_class,
            "enc_coord_unact": enc_coord_unact,
            "lang_hidden": lang_hidden,
            "valid_ratios": valid_ratios,
            "mask_flatten": mask_flatten,
        }
