"""Multi-scale deformable attention — the single hot op of the framework.

Semantics match the reference CUDA kernel `ms_deformable_im2col_gpu_kernel`
(ops/src/cuda/ms_deform_im2col_cuda.cuh:238) and its pure-torch ground truth
`ms_deform_attn_core_pytorch` (ops/functions/ms_deform_attn_func.py:43-63):
for every (query, head, level, point), bilinearly sample the flattened
multi-level value map at `sampling_locations` (normalized to [0,1] per level,
grid_sample align_corners=False / zero padding convention) and reduce with
`attention_weights`.

TPU-first design (profiled on v5e):
  * TPU row-gathers are LATENCY-bound per row, not bandwidth-bound: 10.3M
    32-float rows cost ~22 ms while the same bytes as 2.6M 128-float rows
    cost ~5-8 ms. So the four bilinear corners are packed into ONE gathered
    row: each level's value slab is zero-padded by 1 pixel and concatenated
    with itself rolled by {1, W+2, W+3}, giving a (rows, 4*D) buffer where
    one row fetch returns all four corners of a sample.
  * The zero border makes corner handling branch-free: in-frame clipping plus
    a single per-point in-range mask reproduce grid_sample's zero padding
    exactly (border contributions land on zero rows).
  * PER-LEVEL packed tables with ONE p-major `promise_in_bounds` gather per
    level; the fold consumes the gather output through its transposed view
    (XLA's row gather emits column-major output — any row-major consumer
    inserts a full relayout copy): corner fold as 4 sublane-block multiplies,
    point fold as 128-aligned lane-block adds, one final output transpose.
    A single fused all-level gather reaches a faster emitter regime but
    loses more in its fold — measured, not adopted (docs/PERF.md).
  * `spatial_shapes` is a STATIC python tuple: sizes are bucketed by the data
    pipeline, every level arithmetic constant-folds, no level_start_index
    tensor exists at runtime.
  * Backward: hand-written `jax.custom_vjp` (`_msda_packed_bwd`) — dvalue as
    a row-major corner-packed scatter-add (the pack inverted by three rolls
    and a sum), dloc/datt by regathering the corners and folding per-sample
    dot products. Same numerics as the reference col2im backward; f64-exact
    vs AD of the independent unpacked formulation (tests/test_msda.py).

Layouts:
  value:              (B, S, M, D)    S = sum(H_l * W_l)
  sampling_locations: (B, Lq, M, L, P, 2)  in [0, 1], (x, y) order
  attention_weights:  (B, Lq, M, L, P)     softmax-normalized over (L, P)
  returns:            (B, Lq, M * D)
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _pack_levels(value_t: jnp.ndarray,
                 spatial_shapes: Sequence[Tuple[int, int]]):
    """Per-level corner-packed, zero-padded buffers.

    value_t: (B, M, S, D). Returns a list of (B, M, Rl, 4*D) where one row
    holds all four bilinear corners of a sample: each level's slab is
    zero-padded by 1 pixel and concatenated with itself rolled by
    {1, W+2, W+3}. Per-level (rather than one concatenated) buffers keep
    each gather's table small, which measures ~2x faster on v5e.
    """
    B, M, S, D = value_t.shape
    out, start = [], 0
    for (H, W) in spatial_shapes:
        slab = jax.lax.slice_in_dim(value_t, start, start + H * W, axis=2)
        slab = slab.reshape(B, M, H, W, D)
        slab = jnp.pad(slab, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        R = (H + 2) * (W + 2)
        flat = slab.reshape(B, M, R, D)
        out.append(jnp.concatenate([
            flat,
            jnp.roll(flat, -1, axis=2),
            jnp.roll(flat, -(W + 2), axis=2),
            jnp.roll(flat, -(W + 3), axis=2),
        ], axis=-1))                                     # (B, M, R, 4D)
        start += H * W
    return out


def _indices_weights(spatial_shapes, loc, att, full=False):
    """Per-level packed-row index (B,M,Lq,P) and folded corner weights
    (B,M,Lq,P,4). `loc`/`att` are head-major: (B,M,Lq,L,P,2) / (B,M,Lq,L,P).
    Bilinear math runs in float32 regardless of activation dtype.

    With `full`, additionally returns per level the pieces the custom VJP
    needs: bilinear-only corner weights `bl` (B,M,Lq,P,4), the masked
    attention `a_m`, and the fractional offsets `fx`, `fy`."""
    idxs, ws, extras = [], [], []
    for lvl, (H, W) in enumerate(spatial_shapes):
        f32 = jnp.promote_types(jnp.float32, loc.dtype)
        l = loc[:, :, :, lvl]                            # (B, M, Lq, P, 2)
        a = att[:, :, :, lvl].astype(f32)
        x = l[..., 0].astype(f32) * W - 0.5
        y = l[..., 1].astype(f32) * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        # single in-range mask per point; border cases resolve via zero pad
        in_range = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1))
        a = a * in_range
        bx = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
        by = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)
        idxs.append(by * (W + 2) + bx)                   # (B, M, Lq, P)
        bl = jnp.stack([(1 - fx) * (1 - fy),
                        fx * (1 - fy),
                        (1 - fx) * fy,
                        fx * fy], axis=-1)               # (B, M, Lq, P, 4)
        ws.append(bl * a[..., None])
        if full:
            extras.append((bl, a, fx, fy, in_range))
    if full:
        return idxs, ws, extras
    return idxs, ws


def _pad_q_layout(B, M, Lq):
    """Query padding so lane-block boundaries in the fold are 128-aligned."""
    q_align = 128 // math.gcd(B * M, 128)
    Lq_pad = -(-Lq // q_align) * q_align
    return Lq_pad, Lq_pad - Lq, B * M * Lq_pad


def _gather_index(idx, Rl, pad_q):
    """(B,M,Lq,P) packed-row index -> flat p-major (P*BMLq,) into the
    (B*M*Rl, 4D) buffer."""
    bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * idx.shape[1]
          + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
    gidx = bm * Rl + idx
    if pad_q:
        gidx = jnp.pad(gidx, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    return jnp.transpose(gidx, (3, 0, 1, 2)).reshape(-1)


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Fused multi-level bilinear gather + attention-weighted reduction.

    Transposed-view formulation (v4, round 2): XLA's row gather emits its
    output in a column-major layout; any row-major consumer inserts a full
    relayout copy per level (~160 MB each at encoder scale). So the fold
    consumes the gather output through a transposed view and stays in
    (sublane=D, lane=sample) space end to end:
      * per-level gathers with p-major sample order (p, b, m, q),
      * corner fold = 4 sublane-block multiplies (weights broadcast on lanes),
      * point fold = lane-block adds at 128-aligned boundaries (queries are
        padded so B*M*Lq is a multiple of 128),
      * one final (D, B, M, Lq) -> (B, Lq, M*D) transpose of the 20 MB output.
    Measured on v5e at encoder scale (Lq=S=20197): 17.4 ms -> 9.0 ms in
    bfloat16, bit-identical to the reference formulation in float32/float64.

    The backward is a hand-written VJP (see `_msda_packed_bwd`): the AD
    transpose of the transposed-view fold materializes the full per-level
    gather cotangent through a layout change and costs ~7x the forward.
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes), (
        f"value length {S} != sum of spatial shapes "
        f"{sum(h * w for h, w in spatial_shapes)}")

    # Under sequence parallelism the query axis is sharded over "model"; the
    # flat p-major gather below puts that axis innermost of a 1-D index
    # vector, which XLA's SPMD partitioner lowers pathologically (hours-slow
    # resharding program). Use the dimension-preserving formulation there —
    # its (B, M, Lq*P) gathers shard cleanly on Lq.
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and "model" in mesh.axis_names \
            and dict(mesh.shape).get("model", 1) > 1:
        return ms_deform_attn_unpacked(value, spatial_shapes,
                                       sampling_locations, attention_weights)

    return _msda_packed(tuple(spatial_shapes), value, sampling_locations,
                        attention_weights)


def _packed_forward(spatial_shapes, value, sampling_locations,
                    attention_weights):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype
    Lq_pad, pad_q, BMLq = _pad_q_layout(B, M, Lq)

    value_t = jnp.transpose(value, (0, 2, 1, 3))         # (B, M, S, D)
    packed = _pack_levels(value_t, spatial_shapes)
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5))
    att = jnp.transpose(attention_weights, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, loc, att)

    out = 0
    for lvl in range(L):
        Rl = packed[lvl].shape[2]
        buf = packed[lvl].reshape(B * M * Rl, 4 * D)
        gidx = _gather_index(idxs[lvl], Rl, pad_q)             # p-major
        g = buf.at[gidx].get(mode="promise_in_bounds")   # (P*BMLq, 4D)
        gT = g.T                                         # (4D, P*BMLq): free view
        w = ws[lvl].astype(dtype)                        # (B, M, Lq, P, 4)
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        wT = jnp.transpose(w, (4, 3, 0, 1, 2)).reshape(4, -1)  # (4, P*BMLq)
        acc = (gT[0 * D:1 * D, :] * wT[0:1, :]
               + gT[1 * D:2 * D, :] * wT[1:2, :]
               + gT[2 * D:3 * D, :] * wT[2:3, :]
               + gT[3 * D:4 * D, :] * wT[3:4, :])        # (D, P*BMLq)
        r = acc[:, 0 * BMLq:1 * BMLq].astype(
            jnp.promote_types(jnp.float32, dtype))
        for p in range(1, P):
            r = r + acc[:, p * BMLq:(p + 1) * BMLq]
        out = out + r                                    # (D, BMLq) f32
    out = out.reshape(D, B, M, Lq_pad)[:, :, :, :Lq]
    return jnp.transpose(out.astype(dtype), (1, 3, 2, 0)).reshape(B, Lq, M * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_packed(spatial_shapes, value, sampling_locations,
                 attention_weights):
    return _packed_forward(spatial_shapes, value, sampling_locations,
                           attention_weights)


def _msda_packed_fwd(spatial_shapes, value, sampling_locations,
                     attention_weights):
    out = _packed_forward(spatial_shapes, value, sampling_locations,
                          attention_weights)
    # save only the raw inputs; packing/index math is recomputed in bwd
    # (cheap, and composes with the encoder's remat without residual bloat)
    return out, (value, sampling_locations, attention_weights)


def _msda_packed_bwd(spatial_shapes, res, dy):
    """Hand-written transpose of the packed formulation.

    Matches the reference col2im backward
    (ops/src/cuda/ms_deform_im2col_cuda.cuh grad paths) semantically:
      dvalue  — corner-packed row-major scatter-add: the four bilinear-corner
                cotangent rows of a sample are one (4D,) row scattered at the
                SAME packed index the forward gathered, then the pack is
                inverted by three rolls and a sum (exact: `by <= H` bounds
                every packed index at least W+4 rows from the table end, so
                no roll wraparound can alias).
      dloc/datt — regather the corner values (same fast p-major gathers as
                the forward) and fold per-sample dot products s_c = <g_c, dy>
                with the bilinear weight derivatives.
    Everything is built row-major directly from dy, so no relayout of the
    (P*BMLq, 4D) gather cotangent ever materializes — that relayout plus the
    AD scatter layout is where the 7x AD backward tax went.
    """
    value, samp_loc, att_in = res
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = samp_loc.shape
    dtype = value.dtype
    Lq_pad, pad_q, BMLq = _pad_q_layout(B, M, Lq)

    value_t = jnp.transpose(value, (0, 2, 1, 3))
    packed = _pack_levels(value_t, spatial_shapes)
    loc = jnp.transpose(samp_loc, (0, 2, 1, 3, 4, 5))
    att = jnp.transpose(att_in, (0, 2, 1, 3, 4))
    idxs, ws, extras = _indices_weights(spatial_shapes, loc, att, full=True)

    # cotangent in row-major sample space
    dy4 = jnp.transpose(dy.reshape(B, Lq, M, D), (0, 2, 1, 3))  # (B,M,Lq,D)
    if pad_q:
        dy4 = jnp.pad(dy4, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    acc_dt = jnp.promote_types(jnp.float32, dtype)
    dy_rows = dy4.reshape(BMLq, D).astype(acc_dt)
    dyT = dy_rows.T                                      # (D, BMLq) f32 view
    dy_rows_p = jnp.tile(dy_rows, (P, 1))                # (P*BMLq, D) p-major

    dval_slabs, datt_lvls, dloc_lvls = [], [], []
    for lvl, (H, W) in enumerate(spatial_shapes):
        Rl = packed[lvl].shape[2]
        buf = packed[lvl].reshape(B * M * Rl, 4 * D)
        gidx = _gather_index(idxs[lvl], Rl, pad_q)

        # --- s_{c,p}[n] = <g_c, dy_n>: transposed-view consumption ---
        g = buf.at[gidx].get(mode="promise_in_bounds")   # (P*BMLq, 4D)
        gT = g.T
        s_cp = []
        for c in range(4):
            for p in range(P):
                blk = gT[c * D:(c + 1) * D, p * BMLq:(p + 1) * BMLq]
                s_cp.append((blk.astype(acc_dt) * dyT).sum(0))
        s = jnp.stack(s_cp).reshape(4, P, B, M, Lq_pad)
        s = jnp.transpose(s, (2, 3, 4, 1, 0))            # (B,M,Lq_pad,P,4)
        if pad_q:
            s = s[:, :, :Lq]

        bl, a_m, fx, fy, in_range = extras[lvl]
        datt_lvls.append(jnp.where(in_range, (bl * s).sum(-1), 0.0))
        s0, s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
        dfx = a_m * ((s1 - s0) * (1 - fy) + (s3 - s2) * fy)
        dfy = a_m * ((s2 - s0) * (1 - fx) + (s3 - s1) * fx)
        dloc_lvls.append(jnp.stack([dfx * W, dfy * H], axis=-1))

        # --- dvalue: row-major corner-packed scatter-add ---
        w = ws[lvl]                                      # (B,M,Lq,P,4) f32
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        w_rows = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(P * BMLq, 4)
        u = (w_rows[:, :, None] * dy_rows_p[:, None, :]).reshape(-1, 4 * D)
        tbl = jnp.zeros((B * M * Rl, 4 * D), acc_dt)
        tbl = tbl.at[gidx].add(u, mode="promise_in_bounds")
        tbl = tbl.reshape(B, M, Rl, 4, D)
        dflat = (tbl[..., 0, :]
                 + jnp.roll(tbl[..., 1, :], 1, axis=2)
                 + jnp.roll(tbl[..., 2, :], W + 2, axis=2)
                 + jnp.roll(tbl[..., 3, :], W + 3, axis=2))   # (B,M,Rl,D)
        dslab = dflat.reshape(B, M, H + 2, W + 2, D)[:, :, 1:H + 1, 1:W + 1]
        dval_slabs.append(dslab.reshape(B, M, H * W, D))

    dvalue = jnp.transpose(jnp.concatenate(dval_slabs, axis=2),
                           (0, 2, 1, 3)).astype(dtype)
    datt = jnp.transpose(jnp.stack(datt_lvls, axis=3),
                         (0, 2, 1, 3, 4)).astype(att_in.dtype)
    dloc = jnp.transpose(jnp.stack(dloc_lvls, axis=3),
                         (0, 2, 1, 3, 4, 5)).astype(samp_loc.dtype)
    return dvalue, dloc, datt


_msda_packed.defvjp(_msda_packed_fwd, _msda_packed_bwd)


def ms_deform_attn_unpacked(value: jnp.ndarray,
                            spatial_shapes: Sequence[Tuple[int, int]],
                            sampling_locations: jnp.ndarray,
                            attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Simple per-corner-gather formulation (kept as a second implementation
    for cross-checking the packed kernel in tests)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    value_t = jnp.transpose(value, (0, 2, 1, 3))

    out = jnp.zeros((B, Lq, M, D), dtype=value.dtype)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value_t, start, start + H * W, axis=2)
        loc = sampling_locations[:, :, :, lvl]
        attn = attention_weights[:, :, :, lvl]
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0).astype(value.dtype)
        fy = (y - y0).astype(value.dtype)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def corner(ix, iy):
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            flat = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
            return flat, valid.astype(value.dtype)

        acc = 0
        a = attn.astype(value.dtype)
        for (ix, iy, wgt) in (
                (x0i, y0i, lambda: (1 - fx) * (1 - fy)),
                (x0i + 1, y0i, lambda: fx * (1 - fy)),
                (x0i, y0i + 1, lambda: (1 - fx) * fy),
                (x0i + 1, y0i + 1, lambda: fx * fy)):
            flat, valid = corner(ix, iy)
            flat_t = jnp.transpose(flat, (0, 2, 1, 3)).reshape(B, M, Lq * P)
            g = jnp.take_along_axis(value_l, flat_t[..., None], axis=2)
            g = g.reshape(B, M, Lq, P, D)
            wcomb = jnp.transpose(wgt() * valid * a, (0, 2, 1, 3))
            acc = acc + (g * wcomb[..., None]).sum(axis=3)
        out = out + jnp.transpose(acc, (0, 2, 1, 3))
        start += H * W
    return out.reshape(B, Lq, M * D)
