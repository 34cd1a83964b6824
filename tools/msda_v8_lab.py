"""MSDA v8 lab: 4MB head-split gathers (round 3 serving offensive, cont).

The v7 rate grid (tools/msda_v7_lab.py rate) mapped the XLA row-gather
emitter precisely:

    table <= 4MB : ~585-714 rows/us at EVERY row count      (fast)
    rows  >= 2M  : ~510 rows/us regardless of table size    (fast)
    otherwise    : ~160-180 rows/us                         (slow)

The in-model MSDA gathers are 0.65M rows/level, so only the table-size
lever applies. v7's G=2 / G=4 head-splits produced 16MB / 8MB sub-tables
-- still in the slow regime, which is why v7 lost. The ONLY winning
split is G=8 (Mg=1): the 800x1216 level-0 per-head table is
15708 rows x 256B = 4.02MB, just under the cliff. Level 1 (8MB full) is
already fast at 646k rows (528 rows/us); levels 2-3 are tiny.

v8 therefore splits ONLY levels whose full table is slow AND whose
per-head table lands <= 4.2MB, packs each head's table DIRECTLY from the
value slab (no slicing of a big packed buffer), and keeps everything
else identical to shipping v4. This file isolates where v7's +5ms went:

  stage: L0-stage-only (pack+gather+fold) -- 1x648k@32MB vs 8x81k@4MB
  model: v4 vs v8 in-model
  parity: exact vs shipping (must be bit-identical in f32)

Usage: python tools/msda_v8_lab.py [stage|model|parity ...]
"""
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uninext_tpu.ops.msda import (  # noqa: E402
    ms_deform_attn, _pack_levels, _indices_weights, _pad_q_layout,
    _gather_index)

SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))  # 800x1216 encoder levels
B, M, D, L, P = 1, 8, 32, 4, 4
S = sum(h * w for h, w in SHAPES)
Lq = S
N_ITERS = 50
N_REPS = 3
FAST_TABLE_BYTES = 4.2 * 1024 * 1024


def honest_time(fn, args, perturb):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*perturb(i, a))
            return acc + out.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0))

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(args[0].astype(jnp.float32).reshape(-1)[:8]))
    overheads = []
    for k in range(N_REPS):
        t0 = time.perf_counter()
        float(trivial(args[0].astype(jnp.float32).reshape(-1)[:8] + 1 + k))
        overheads.append(time.perf_counter() - t0)
    overhead = min(overheads)

    float(loop(*args))
    best = float("inf")
    for k in range(1, N_REPS + 1):
        argsk = tuple(a * (1 + k * 1e-6) if a.dtype in (jnp.float32,
                                                        jnp.bfloat16)
                      else a for a in args)
        t0 = time.perf_counter()
        float(loop(*argsk))
        best = min(best, time.perf_counter() - t0 - overhead)
    return best / N_ITERS * 1e3  # ms


def make_inputs(dtype=jnp.bfloat16, seed=0):
    @jax.jit
    def gen(key):
        kv, kl, ka = jax.random.split(key, 3)
        value = jax.random.normal(kv, (B, S, M, D), dtype)
        loc = jax.random.uniform(kl, (B, Lq, M, L, P, 2), jnp.float32)
        att = jax.random.uniform(ka, (B, Lq, M, L, P), jnp.float32)
        att = att / att.sum(axis=(-1, -2), keepdims=True)
        return value, loc, att

    out = gen(jax.random.PRNGKey(seed))
    jax.block_until_ready(out)
    return out


def perturb_loc(i, a):
    value, loc, att = a
    return value, loc + i.astype(jnp.float32) * 1e-7, att


def perturb_value_loc(i, a):
    """Perturb BOTH value and loc so the table pack is NOT loop-invariant:
    in the real encoder the value changes every layer, so pack cost must be
    inside the timed region (XLA hoists loop-invariant packs otherwise,
    which skews variant comparisons)."""
    value, loc, att = a
    f = (1 + i.astype(jnp.float32) * 1e-7).astype(value.dtype)
    return value * f, loc + i.astype(jnp.float32) * 1e-7, att


# ------------------------------------------------------------------ v8 op

def _pack_one_level(value_t, start, H, W):
    """Corner-packed zero-padded buffer for ONE level from the (B, Mh, S, D)
    slab. Mh may be a head sub-range. Returns (B, Mh, R, 4D)."""
    Bh, Mh, _, Dh = value_t.shape
    slab = jax.lax.slice_in_dim(value_t, start, start + H * W, axis=2)
    slab = slab.reshape(Bh, Mh, H, W, Dh)
    slab = jnp.pad(slab, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    R = (H + 2) * (W + 2)
    flat = slab.reshape(Bh, Mh, R, Dh)
    return jnp.concatenate([
        flat,
        jnp.roll(flat, -1, axis=2),
        jnp.roll(flat, -(W + 2), axis=2),
        jnp.roll(flat, -(W + 3), axis=2),
    ], axis=-1)


def _split_groups(dtype_bytes):
    """Per level: number of head groups (1 = no split). Split only when the
    full table is in the slow-emitter regime AND per-head tables reach the
    fast (<=4.2MB) regime."""
    groups = []
    for (H, W) in SHAPES:
        R = (H + 2) * (W + 2)
        full = B * M * R * 4 * D * dtype_bytes
        per_head = B * R * 4 * D * dtype_bytes
        if full > 2 * FAST_TABLE_BYTES and per_head <= FAST_TABLE_BYTES:
            groups.append(M)
        else:
            groups.append(1)
    return groups


def msda_v8(value, spatial_shapes, loc, att, groups=None):
    """v4 with per-head-packed fast-regime gathers for oversized levels.
    Bit-identical math to shipping v4 (same rows, same fold order)."""
    B_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = loc.shape
    dtype = value.dtype
    Lq_pad, pad_q, BMLq = _pad_q_layout(B_, M_, Lq_)

    value_t = jnp.transpose(value, (0, 2, 1, 3))         # (B, M, S, D)
    locT = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
    attT = jnp.transpose(att, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, locT, attT)
    if groups is None:
        groups = _split_groups(jnp.dtype(dtype).itemsize)

    out = 0
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        R = (H + 2) * (W + 2)
        G = groups[lvl]
        w = ws[lvl].astype(dtype)                        # (B, M, Lq, P, 4)
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        if G == 1:
            buf = _pack_one_level(value_t, start, H, W).reshape(
                B_ * M_ * R, 4 * D_)
            gidx = _gather_index(idxs[lvl], R, pad_q)
            g = buf.at[gidx].get(mode="promise_in_bounds")
            gT = g.T                                     # free view
            wT = jnp.transpose(w, (4, 3, 0, 1, 2)).reshape(4, -1)
            acc = (gT[0 * D_:1 * D_] * wT[0:1] + gT[1 * D_:2 * D_] * wT[1:2]
                   + gT[2 * D_:3 * D_] * wT[2:3]
                   + gT[3 * D_:4 * D_] * wT[3:4])
            r = acc[:, :BMLq].astype(jnp.float32)
            for p in range(1, P_):
                r = r + acc[:, p * BMLq:(p + 1) * BMLq]
            out = out + r                                # (D, BMLq)
        else:
            Mg = M_ // G
            BMgLq = B_ * Mg * Lq_pad
            parts = []
            for g0 in range(0, M_, Mg):
                # pack THIS head group's table directly from the value slab
                buf = _pack_one_level(
                    jax.lax.slice_in_dim(value_t, g0, g0 + Mg, axis=1),
                    start, H, W).reshape(B_ * Mg * R, 4 * D_)
                idx = idxs[lvl][:, g0:g0 + Mg]           # (B, Mg, Lq, P)
                bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * Mg
                      + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
                gidx = bm * R + idx
                if pad_q:
                    gidx = jnp.pad(gidx,
                                   ((0, 0), (0, 0), (0, pad_q), (0, 0)))
                gidx = jnp.transpose(gidx, (3, 0, 1, 2)).reshape(-1)
                g = buf.at[gidx].get(mode="promise_in_bounds")
                gT = g.T                                 # (4D, P*BMgLq)
                wg = w[:, g0:g0 + Mg]
                wT = jnp.transpose(wg, (4, 3, 0, 1, 2)).reshape(4, -1)
                acc = (gT[0 * D_:1 * D_] * wT[0:1]
                       + gT[1 * D_:2 * D_] * wT[1:2]
                       + gT[2 * D_:3 * D_] * wT[2:3]
                       + gT[3 * D_:4 * D_] * wT[3:4])
                r = acc[:, :BMgLq].astype(jnp.float32)
                for p in range(1, P_):
                    r = r + acc[:, p * BMgLq:(p + 1) * BMgLq]
                parts.append(r.reshape(D_, B_, Mg, Lq_pad))
            out = out + jnp.concatenate(parts, axis=2).reshape(D_, BMLq)
        start += H * W

    out = jnp.asarray(out).reshape(D_, B_, M_, Lq_pad)[:, :, :, :Lq_]
    return jnp.transpose(out.astype(dtype),
                         (1, 3, 2, 0)).reshape(B_, Lq_, M_ * D_)


# ------------------------------------------------- L0-stage-only isolation

def stage_probe():
    """Time ONLY the level-0 stage: pack + gather + fold, both layouts.
    Isolates whether v7's in-model loss was gather rate or glue."""
    args = make_inputs(jnp.bfloat16)
    H, W = SHAPES[0]
    R = (H + 2) * (W + 2)
    Lq_pad, pad_q, BMLq = _pad_q_layout(B, M, Lq)

    def l0_only(groups):
        def fn(value, loc, att):
            value_t = jnp.transpose(value, (0, 2, 1, 3))
            locT = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
            attT = jnp.transpose(att, (0, 2, 1, 3, 4))
            idxs, ws = _indices_weights(SHAPES[:1], locT[:, :, :, :1],
                                        attT[:, :, :, :1])
            w = ws[0].astype(value.dtype)
            if pad_q:
                w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
            G = groups
            Mg = M // G
            BMgLq = B * Mg * Lq_pad
            parts = []
            for g0 in range(0, M, Mg):
                buf = _pack_one_level(
                    jax.lax.slice_in_dim(value_t, g0, g0 + Mg, axis=1),
                    0, H, W).reshape(B * Mg * R, 4 * D)
                idx = idxs[0][:, g0:g0 + Mg]
                bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * Mg
                      + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
                gidx = bm * R + idx
                if pad_q:
                    gidx = jnp.pad(gidx,
                                   ((0, 0), (0, 0), (0, pad_q), (0, 0)))
                gidx = jnp.transpose(gidx, (3, 0, 1, 2)).reshape(-1)
                g = buf.at[gidx].get(mode="promise_in_bounds")
                gT = g.T
                wg = w[:, g0:g0 + Mg]
                wT = jnp.transpose(wg, (4, 3, 0, 1, 2)).reshape(4, -1)
                acc = (gT[0 * D:1 * D] * wT[0:1] + gT[1 * D:2 * D] * wT[1:2]
                       + gT[2 * D:3 * D] * wT[2:3]
                       + gT[3 * D:4 * D] * wT[3:4])
                r = acc[:, :BMgLq].astype(jnp.float32)
                for p in range(1, P):
                    r = r + acc[:, p * BMgLq:(p + 1) * BMgLq]
                parts.append(r.reshape(D, B, Mg, Lq_pad))
            return jnp.concatenate(parts, axis=2)
        return fn

    for G in (1, 2, 4, 8):
        ms = honest_time(l0_only(G), args, perturb_loc)
        per_tbl = B * (M // G) * R * 4 * D * 2 / 1e6
        print(f"L0 stage G={G} ({per_tbl:5.1f}MB/table)  {ms:7.2f} ms")


def model_probe(perturb=perturb_loc):
    args = make_inputs(jnp.bfloat16)
    for name, fn in [
        ("v4 shipping bf16", lambda v, l, a: ms_deform_attn(v, SHAPES, l, a)),
        ("v8 G=8 L0 only",
         lambda v, l, a: msda_v8(v, SHAPES, l, a, groups=(8, 1, 1, 1))),
        ("v8 G=8 L0+L1",
         lambda v, l, a: msda_v8(v, SHAPES, l, a, groups=(8, 8, 1, 1))),
        ("v8 auto", lambda v, l, a: msda_v8(v, SHAPES, l, a)),
    ]:
        ms = honest_time(fn, args, perturb)
        print(f"{name:24s} {ms:7.2f} ms/call")


def parity():
    v, l, a = make_inputs(jnp.float32, seed=3)
    ref = ms_deform_attn(v, SHAPES, l, a)
    for name, g in [("G=8 L0", (8, 1, 1, 1)), ("auto", None)]:
        err = float(jnp.abs(msda_v8(v, SHAPES, l, a, groups=g) - ref).max())
        print(f"v8 {name:10s} max|err| vs shipping = {err:.2e}")


def main(variants):
    dev = jax.devices()[0]
    print(f"device: {dev.platform} S={S} groups_auto="
          f"{_split_groups(2)}")
    everything = not variants
    if everything or "stage" in variants:
        stage_probe()
    if everything or "model" in variants:
        model_probe()
    if everything or "modelv" in variants:
        model_probe(perturb=perturb_value_loc)
    if everything or "parity" in variants:
        parity()


if __name__ == "__main__":
    main(sys.argv[1:])
