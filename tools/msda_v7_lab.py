"""MSDA v7 lab: head-split level-0 gather (round 3 serving offensive).

The fp8 probe (tools/msda_fp8_probe.py) established that the XLA gather
emitter's rate is a strong function of TABLE SIZE at bf16:
    L0 32MB table: 171 rows/us        L1 8MB table: 498 rows/us
(same 0.65M row count). 8-bit tables are SLOWER (emitter penalizes
sub-16-bit rows), but the level-0 table can be shrunk *exactly*: the
packed index is bm*Rl + idx, so the (B*M*Rl, 4D) buffer partitions by
HEAD into G statically-disjoint sub-tables of M/G heads each — same
rows, same values, bit-identical output. If a 16/8/4MB table keeps the
~500 rows/us rate at 1/G of the rows, the L0 gather drops ~3.8 -> ~1.3ms
per call, ~15ms per 6-layer encoder frame.

Measures:
  1. rate grid: gather rate over (table MB x row count) at bf16, 128-el rows
  2. in-model: v4 baseline vs v7 head-split (G in {2,4,8}) vs fused-1-gather
  3. exact parity of every variant vs the shipping op (f32)

Usage: python tools/msda_v7_lab.py [rate|model|parity ...]
"""
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uninext_tpu.ops.msda import (  # noqa: E402
    ms_deform_attn, _pack_levels, _indices_weights)

SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))  # 800x1216 encoder levels
B, M, D, L, P = 1, 8, 32, 4, 4
S = sum(h * w for h, w in SHAPES)
Lq = S
N_ITERS = 50
N_REPS = 3


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


# ---------------------------------------------------------------- rate grid

def rate_grid():
    row_els = 128  # 256B bf16 rows, the packed-table row shape
    for tbl_mb in (4, 8, 16, 24, 32, 43):
        rl = tbl_mb * 1024 * 1024 // (row_els * 2)
        for rows in (81_000, 162_000, 323_000, 646_000, 2_590_000):
            @jax.jit
            def gen(key, rl=rl, rows=rows):
                kt, ki = jax.random.split(key)
                tbl = jax.random.normal(kt, (rl, row_els), jnp.bfloat16)
                idx = jax.random.randint(ki, (rows,), 0, rl, jnp.int32)
                return tbl, idx

            tbl, idx = gen(jax.random.PRNGKey(1))
            jax.block_until_ready((tbl, idx))

            def g(tbl, idx):
                return tbl.at[idx].get(mode="promise_in_bounds")[:, :8]

            def perturb(i, a):
                tbl, idx = a
                return tbl, (idx + i) % tbl.shape[0]

            ms = honest_time(g, (tbl, idx), perturb)
            print(f"table {tbl_mb:3d}MB rows {rows/1e3:7.0f}k  "
                  f"{ms:7.3f} ms   {rows/(ms*1e3):6.0f} rows/us")


# ------------------------------------------------------- in-model v7 variants

def msda_v7(value, spatial_shapes, loc, att, split_mb=12.0, fused=False):
    """v4 transposed-view formulation + head-split gathers for any level
    whose packed table exceeds `split_mb` (bf16 MB). Exact same rows and
    fold math as v4 — bit-identical output.

    With `fused`, all NON-split levels additionally share ONE gather over
    a concatenated table (v5 revisit with the v4 chunk fold).
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    dtype = value.dtype

    value_t = jnp.transpose(value, (0, 2, 1, 3))
    packed = _pack_levels(value_t, spatial_shapes)
    locT = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
    attT = jnp.transpose(att, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, locT, attT)

    # head-group count per level: smallest G (dividing M) whose sub-table
    # fits under split_mb
    def n_groups(Rl):
        bytes_full = B * M * Rl * 4 * D * 2  # bf16
        g = 1
        while g < M and bytes_full / g > split_mb * 1024 * 1024:
            g *= 2
        return g

    groups = [n_groups(p.shape[2]) for p in packed]
    Gmax = max(groups)
    Mg_min = M // Gmax
    q_align = 128 // math.gcd(B * Mg_min, 128)
    Lq_pad = -(-Lq // q_align) * q_align
    pad_q = Lq_pad - Lq

    def gather_fold(buf_rows, idx, w, Mg):
        """One gather + v4 chunk fold over Mg heads' samples.
        idx: (B, Mg, Lq, P); w: (B, Mg, Lq, P, 4); buf_rows: (B*Mg*Rl, 4D).
        Returns (D, B*Mg*Lq_pad) f32."""
        Rl = buf_rows.shape[0] // (B * Mg)
        BMgLq = B * Mg * Lq_pad
        bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * Mg
              + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
        gidx = bm * Rl + idx
        if pad_q:
            gidx = jnp.pad(gidx, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        gidx = jnp.transpose(gidx, (3, 0, 1, 2)).reshape(-1)
        g = buf_rows.at[gidx].get(mode="promise_in_bounds")
        gT = g.T                                   # (4D, P*BMgLq) free view
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        wT = jnp.transpose(w.astype(dtype), (4, 3, 0, 1, 2)).reshape(4, -1)
        acc = (gT[0 * D:1 * D] * wT[0:1] + gT[1 * D:2 * D] * wT[1:2]
               + gT[2 * D:3 * D] * wT[2:3] + gT[3 * D:4 * D] * wT[3:4])
        r = acc[:, 0 * BMgLq:1 * BMgLq].astype(jnp.float32)
        for p in range(1, P):
            r = r + acc[:, p * BMgLq:(p + 1) * BMgLq]
        return r                                    # (D, BMgLq)

    out = jnp.zeros((D, B, M, Lq_pad), jnp.float32)

    # fused single gather across all non-split levels (optional)
    fused_lvls = [l for l in range(L) if groups[l] == 1] if fused else []
    solo_lvls = [l for l in range(L) if groups[l] == 1 and l not in
                 fused_lvls]
    split_lvls = [l for l in range(L) if groups[l] > 1]

    if fused_lvls:
        Rls = [packed[l].shape[2] for l in fused_lvls]
        buf = jnp.concatenate(
            [packed[l].reshape(B * M * r, 4 * D)
             for l, r in zip(fused_lvls, Rls)], axis=0)
        offs = np.cumsum([0] + [B * M * r for r in Rls])
        BMLq = B * M * Lq_pad
        gparts = []
        for k, l in enumerate(fused_lvls):
            idx = idxs[l]
            bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * M
                  + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
            gi = bm * Rls[k] + idx + int(offs[k])
            if pad_q:
                gi = jnp.pad(gi, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
            gparts.append(jnp.transpose(gi, (3, 0, 1, 2)).reshape(-1))
        g = buf.at[jnp.concatenate(gparts)].get(mode="promise_in_bounds")
        gT = g.T
        n = P * BMLq
        for k, l in enumerate(fused_lvls):
            w = ws[l]
            if pad_q:
                w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
            wT = jnp.transpose(w.astype(dtype), (4, 3, 0, 1, 2)).reshape(4, -1)
            gTl = gT[:, k * n:(k + 1) * n]
            acc = (gTl[0 * D:1 * D] * wT[0:1] + gTl[1 * D:2 * D] * wT[1:2]
                   + gTl[2 * D:3 * D] * wT[2:3] + gTl[3 * D:4 * D] * wT[3:4])
            r = acc[:, 0 * BMLq:1 * BMLq].astype(jnp.float32)
            for p in range(1, P):
                r = r + acc[:, p * BMLq:(p + 1) * BMLq]
            out = out + r.reshape(D, B, M, Lq_pad)

    for l in solo_lvls:
        Rl = packed[l].shape[2]
        r = gather_fold(packed[l].reshape(B * M * Rl, 4 * D), idxs[l],
                        ws[l], M)
        out = out + r.reshape(D, B, M, Lq_pad)

    for l in split_lvls:
        G = groups[l]
        Mg = M // G
        Rl = packed[l].shape[2]
        parts = []
        for g0 in range(0, M, Mg):
            buf = packed[l][:, g0:g0 + Mg].reshape(B * Mg * Rl, 4 * D)
            r = gather_fold(buf, idxs[l][:, g0:g0 + Mg],
                            ws[l][:, g0:g0 + Mg], Mg)
            parts.append(r.reshape(D, B, Mg, Lq_pad))
        out = out + jnp.concatenate(parts, axis=2)

    out = out[:, :, :, :Lq]
    return jnp.transpose(out.astype(dtype), (1, 3, 2, 0)).reshape(B, Lq, M * D)


def model_probe():
    args = make_inputs(jnp.bfloat16)
    for name, fn in [
        ("v4 shipping bf16", lambda v, l, a: ms_deform_attn(v, SHAPES, l, a)),
        ("v7 split@16MB (G=2 L0)",
         lambda v, l, a: msda_v7(v, SHAPES, l, a, split_mb=16.5)),
        ("v7 split@12MB (G=4 L0)",
         lambda v, l, a: msda_v7(v, SHAPES, l, a, split_mb=12.0)),
        ("v7 split@6MB (G=8 L0, G=2 L1)",
         lambda v, l, a: msda_v7(v, SHAPES, l, a, split_mb=6.0)),
        ("v7 split@12MB + fused rest",
         lambda v, l, a: msda_v7(v, SHAPES, l, a, split_mb=12.0, fused=True)),
    ]:
        ms = honest_time(fn, args, perturb_loc)
        print(f"{name:32s} {ms:7.2f} ms/call")


def parity():
    v, l, a = make_inputs(jnp.float32, seed=3)
    ref = ms_deform_attn(v, SHAPES, l, a)
    for name, fn in [
        ("v7 G=2", lambda: msda_v7(v, SHAPES, l, a, split_mb=16.5)),
        ("v7 G=4", lambda: msda_v7(v, SHAPES, l, a, split_mb=12.0)),
        ("v7 G=8+L1", lambda: msda_v7(v, SHAPES, l, a, split_mb=6.0)),
        ("v7 fused", lambda: msda_v7(v, SHAPES, l, a, split_mb=12.0,
                                     fused=True)),
    ]:
        err = float(jnp.abs(fn() - ref).max())
        print(f"{name:12s} max|err| vs shipping = {err:.2e}")


def main(variants):
    dev = jax.devices()[0]
    print(f"device: {dev.platform} S={S} Lq={Lq} "
          f"rows/level={B*M*Lq*P/1e6:.2f}M")
    everything = not variants
    if everything or "rate" in variants:
        rate_grid()
    if everything or "model" in variants:
        model_probe()
    if everything or "parity" in variants:
        parity()


if __name__ == "__main__":
    main(sys.argv[1:])
