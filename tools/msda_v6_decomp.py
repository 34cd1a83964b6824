#!/usr/bin/env python
"""Decompose v6: gather alone, pallas fold alone, prep alone."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".xla_cache"))

import jax.numpy as jnp
import numpy as np

from uninext_tpu.ops.msda import _pack_levels, _indices_weights
from msda_v6_lab import _pad_q_fused, _fold_pallas, msda_v6

SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))
S = sum(h * w for h, w in SHAPES)
B, M, D, L, P = 1, 8, 32, 4, 4
LQ = S
N_IT = 20
DT = jnp.bfloat16


def overhead():
    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((256, 256))
    float(f(x))
    s = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(x + i + 1))
        s.append(time.perf_counter() - t0)
    return min(s)


def timeit(fn, label, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            o = fn(a[0] + i * jnp.asarray(0, a[0].dtype), *a[1:])
            return acc + o.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0))
    ov = overhead()
    float(loop(*args))
    best = None
    for r in range(3):
        a2 = tuple(x + (r + 1) if jnp.issubdtype(x.dtype, jnp.integer)
                   else x * (1 + 1e-6) for x in args)
        t0 = time.perf_counter()
        float(loop(*a2))
        dt = (time.perf_counter() - t0 - ov) / N_IT
        best = dt if best is None else min(best, dt)
    print(f"{label:38s} {best*1e3:7.2f} ms")
    return best


def staged(value, loc_t, att_t):
    """Everything up to + including the stacked gather; returns g, wT."""
    Lq = loc_t.shape[2]
    Lq_pad, pad_q, BMLq = _pad_q_fused(B, M, Lq)
    value_t = jnp.transpose(value, (0, 2, 1, 3))
    packed = _pack_levels(value_t, SHAPES)
    idxs, ws = _indices_weights(SHAPES, loc_t, att_t)
    bufs, gidx_parts, w_parts, off = [], [], [], 0
    for lvl in range(L):
        Rl = packed[lvl].shape[2]
        bufs.append(packed[lvl].reshape(B * M * Rl, 4 * D))
        idx = idxs[lvl]
        bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * M
              + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
        gidx = off + bm * Rl + idx
        if pad_q:
            gidx = jnp.pad(gidx, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        gidx_parts.append(jnp.transpose(gidx, (3, 0, 1, 2)).reshape(-1))
        w = ws[lvl].astype(DT)
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        w_parts.append(jnp.transpose(w, (4, 3, 0, 1, 2)).reshape(4, -1))
        off += B * M * Rl
    buf = jnp.concatenate(bufs, axis=0)
    gidx = jnp.concatenate(gidx_parts)
    wT = jnp.concatenate(w_parts, axis=1)
    g = buf.at[gidx].get(mode="promise_in_bounds")
    return g, wT


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    value = jnp.array(rng.randn(B, S, M, D), DT)
    loc = jnp.array(rng.rand(B, LQ, M, L, P, 2) * 1.2 - 0.1, jnp.float32)
    att = jax.nn.softmax(jnp.array(
        rng.randn(B, LQ, M, L, P), jnp.float32).reshape(
            B, LQ, M, L * P), -1).reshape(B, LQ, M, L, P)
    loc_t = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
    att_t = jnp.transpose(att, (0, 2, 1, 3, 4))

    # 1. prep+gather, trivial consumer
    Lq_pad, _, BMLq = _pad_q_fused(B, M, LQ)
    timeit(lambda v, l, a: staged(v, l, a)[0].sum(),
           "prep + stacked gather (+sum)", value, loc_t, att_t)

    # 2. prep only (indices+weights, no gather)
    def prep_only(v, l, a):
        g, wT = staged(v, l, a)
        return wT.sum()                      # gather result unused -> DCE'd
    timeit(prep_only, "prep only (gather DCE'd)", value, loc_t, att_t)

    # 3. pallas fold alone on materialized inputs
    g, wT = jax.jit(staged)(value, loc_t, att_t)
    g = jax.block_until_ready(g)
    timeit(lambda gg, ww: _fold_pallas(gg.T, ww, D, BMLq, L * P),
           "pallas fold alone (on g.T)", g, wT)

    # 4. XLA transposed-view fold (v5 form) on the same inputs
    def xla_fold(gg, ww):
        gT = gg.T
        acc = (gT[0*D:1*D] * ww[0:1] + gT[1*D:2*D] * ww[1:2]
               + gT[2*D:3*D] * ww[2:3] + gT[3*D:4*D] * ww[3:4])
        r = acc[:, :BMLq].astype(jnp.float32)
        for c in range(1, L * P):
            r = r + acc[:, c * BMLq:(c + 1) * BMLq]
        return r
    timeit(xla_fold, "XLA transposed-view fold", g, wT)

    # 5. full v6 end to end (for reference)
    timeit(lambda v, l, a: msda_v6(
        v, SHAPES, jnp.transpose(l, (0, 2, 1, 3, 4, 5)),
        jnp.transpose(a, (0, 2, 1, 3, 4))).sum(),
           "full v6", value, loc_t, att_t)
