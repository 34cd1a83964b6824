"""Eval-protocol adaptation: run a TRAINED checkpoint under a cheaper
serving protocol without retraining (VERDICT r4 #1).

The reference's eval-time protocol is configuration, not architecture:

  * query count — two-stage top-k proposal selection (NUM_OBJECT_QUERIES,
    reference uninext/config.py:160). Joint models ship 900; the reference's
    own single-task det config ships 300 (configs/single_task_det.yaml), so
    low-query serving is a reference-sanctioned operating point. With DINO
    mixed query selection the content queries are a learned (Q, C) table
    (`tgt_embed_weight`); serving the top-Q' proposals uses its first Q'
    rows (slot i is matched to proposal rank i by construction of the
    top-k concat, transformer.py:271-289).
  * sampling points — DEC_N_POINTS / ENC_N_POINTS (uninext/config.py:
    163-164). The offset/weight projections lay points out as
    (.., heads, levels, points, ..): keeping the first P' points slices
    those projection columns; the attention softmax renormalizes over the
    remaining (levels x points) slots automatically (layers.py:120).
  * eval resolution — MIN_SIZE_TEST (detectron2 defaults 800 image /
    480 video): no parameter surgery at all.

`adapt_params` performs the corresponding parameter surgery so the SAME
trained weights serve under any (num_queries, enc/dec points) protocol;
`tools/frontier_sweep.py` maps the resulting accuracy <-> throughput
frontier.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _slice_msda(mod: Dict[str, Any], n_heads: int, n_levels: int,
                p_old: int, p_new: int) -> None:
    """Slice one MSDA module's offset/weight projections to p_new points.

    Handles both the plain (Cin, M*L*P*k) layout and the scan-stacked
    (n_layers, Cin, M*L*P*k) layout (leading axes preserved)."""
    for name, per in (("sampling_offsets", 2), ("attention_weights", 1)):
        if name not in mod:
            continue
        for leaf in ("kernel", "bias"):
            w = np.asarray(mod[name][leaf])
            lead = w.shape[:-1]
            full = n_heads * n_levels * p_old * per
            assert w.shape[-1] == full, (name, leaf, w.shape, full)
            w = w.reshape(*lead, n_heads, n_levels, p_old, per)
            w = w[..., :p_new, :]
            mod[name][leaf] = np.ascontiguousarray(
                w.reshape(*lead, n_heads * n_levels * p_new * per))


def _walk_msda(tree: Dict[str, Any], n_heads: int, n_levels: int,
               p_old: int, p_new: int, keys: Tuple[str, ...]) -> int:
    """Recursively slice every MSDA module whose dict key is in `keys`
    (encoder 'self_attn' / decoder 'cross_attn'). Returns modules touched."""
    n = 0
    for k, v in tree.items():
        if not isinstance(v, dict):
            continue
        if k in keys and "sampling_offsets" in v:
            _slice_msda(v, n_heads, n_levels, p_old, p_new)
            n += 1
        else:
            n += _walk_msda(v, n_heads, n_levels, p_old, p_new, keys)
    return n


def adapt_params(params: Dict[str, Any], cfg,
                 num_queries: Optional[int] = None,
                 dec_n_points: Optional[int] = None,
                 enc_n_points: Optional[int] = None):
    """Return (new_params, new_cfg) serving a cheaper eval protocol.

    params: the full variables dict ({'params': ...}) or the bare tree.
    Slices are copies — the input tree is never mutated."""
    import jax

    t = cfg.transformer
    new_t = t
    wrapped = "params" in params and isinstance(params["params"], dict)
    tree = jax.tree.map(np.asarray, params["params"] if wrapped else params)

    if num_queries is not None and num_queries != t.num_queries:
        assert num_queries <= t.num_queries, (
            f"can only serve fewer queries than trained "
            f"({num_queries} > {t.num_queries})")
        emb = tree["transformer"]["tgt_embed_weight"]
        tree["transformer"]["tgt_embed_weight"] = np.ascontiguousarray(
            emb[:num_queries])
        new_t = dataclasses.replace(new_t, num_queries=num_queries)

    if enc_n_points is not None and enc_n_points != t.enc_n_points:
        assert 1 <= enc_n_points < t.enc_n_points
        n = _walk_msda(tree["transformer"], t.nheads, t.num_feature_levels,
                       t.enc_n_points, enc_n_points, keys=("self_attn",))
        # encoder self_attn lives either stacked under encoder_scan (1
        # module) or unrolled per layer; decoder self_attn is plain MHA
        # (q/k/v projections, no sampling_offsets) so it never matches
        assert n >= 1, "no encoder MSDA modules found"
        new_t = dataclasses.replace(new_t, enc_n_points=enc_n_points)

    if dec_n_points is not None and dec_n_points != t.dec_n_points:
        assert 1 <= dec_n_points < t.dec_n_points
        # walk from the ROOT: the deformable-reid head's DecoderLayers
        # (detr.py reid_dec_{i}) live beside `transformer` and share
        # dec_n_points, so they must be sliced consistently
        n = _walk_msda(tree, t.nheads, t.num_feature_levels,
                       t.dec_n_points, dec_n_points, keys=("cross_attn",))
        expect = t.dec_layers + (cfg.n_layer_deformable_reid
                                 if cfg.use_deformable_reid else 0)
        assert n == expect, (n, expect)
        new_t = dataclasses.replace(new_t, dec_n_points=dec_n_points)

    new_cfg = dataclasses.replace(cfg, transformer=new_t)
    out = {"params": tree} if wrapped else tree
    return out, new_cfg
