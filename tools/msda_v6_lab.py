#!/usr/bin/env python
"""v6 experiment (round 3): fused fast-regime gather + Pallas fold.

Idea: stack all level tables into ONE >=2M-row gather (the fast XLA emitter
regime, ~500 rows/us) and recover the fold tax that sank the round-2 v5
experiment with a static-block Pallas kernel reading the gather output
through its transposed view at the HBM-bandwidth floor.

RESULT (2026-08-18, v5e, encoder scale Lq=S=20197, bf16): NOT adopted.

    v4 per-level (ops/msda.py)        8.21 ms
    v6 fused + pallas fold            9.58 ms
    decomposition (tools/msda_v6_decomp.py):
      prep + stacked gather (+sum)    7.40 ms
      pallas fold alone (on g.T)      3.10 ms   <- includes a materialized
      XLA transposed-view fold        4.30 ms      663MB transpose
      full v6                         9.60 ms

Two findings close this route on the current stack:
  1. A pallas_call fixes canonical (row-major) layouts on its operands, so
     the column-major row-gather output pays the SAME ~1.6 ms relayout the
     XLA row-major fold pays — the "free transposed view" trick (v4) only
     works when the consumer is XLA ops whose layout assignment can absorb
     the transpose. The pallas fold does beat the equivalent XLA fold by
     ~1.2 ms, but not by enough to cover the relayout it forces.
  2. The stacked gather measured 7.4 ms this session (5.1 ms in round 2's
     probe): the fast-regime advantage over v4's per-level gathers (6.6 ms)
     is within chip-state variance, not the expected ~1.5 ms win.
Also probed this round: lax.gather with 2-D (2, 2D) slices from UNPACKED
tables — all 4 bilinear corners per item, 4x smaller tables — CRASHES the
TPU worker at encoder scale and hangs at small scale (tools/
gather2d_probe.py); and every dynamic-address Pallas form crashes the
Mosaic AOT helper (tools/pallas_dma_probe.py). v4 stays the op.

Parity of the v6 formulation itself is exact (2.7e-7 rel vs v4 in f32), so
this lab stays runnable for re-evaluation on the next jax/libtpu upgrade.
"""
import functools
import math
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uninext_tpu.ops.msda import (_pack_levels, _indices_weights,
                                  _packed_forward, ms_deform_attn_unpacked)

SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))
S = sum(h * w for h, w in SHAPES)
B, M, D, L, P = 1, 8, 32, 4, 4
LQ = S
N = 20
FOLD_TN = 8192


def _fold_kernel(g_ref, w_ref, o_ref, *, D: int):
    """out[d, n] = sum_c g[c*D + d, n] * w[c, n], accumulated over the inner
    (level*point) grid axis. All blocks static — avoids every Mosaic
    dynamic-addressing path this build rejects."""
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    g = g_ref[:]
    w = w_ref[:]
    acc = o_ref[:]
    for c in range(4):
        acc = acc + (g[c * D:(c + 1) * D, :].astype(jnp.float32)
                     * w[c:c + 1, :].astype(jnp.float32))
    o_ref[:] = acc


def _fold_pallas(gT, wT, D, BMLq, LP):
    TN = FOLD_TN
    assert BMLq % TN == 0
    T = BMLq // TN
    stride = BMLq // TN

    def gmap(t, s):
        return (0, s * stride + t)

    return pl.pallas_call(
        functools.partial(_fold_kernel, D=D),
        grid=(T, LP),
        in_specs=[
            pl.BlockSpec((4 * D, TN), gmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TN), gmap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, TN), lambda t, s: (0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, BMLq), jnp.float32),
    )(gT, wT)


def _pad_q_fused(B, M, Lq):
    bm = B * M
    step = FOLD_TN // math.gcd(bm, FOLD_TN)
    Lq_pad = -(-Lq // step) * step
    return Lq_pad, Lq_pad - Lq, bm * Lq_pad


def msda_v6(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype
    Lq_pad, pad_q, BMLq = _pad_q_fused(B, M, Lq)

    value_t = jnp.transpose(value, (0, 2, 1, 3))
    packed = _pack_levels(value_t, spatial_shapes)
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5))
    att = jnp.transpose(attention_weights, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, loc, att)

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
        w = ws[lvl].astype(dtype)
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        w_parts.append(jnp.transpose(w, (4, 3, 0, 1, 2)).reshape(4, -1))
        off += B * M * Rl
    buf = jnp.concatenate(bufs, axis=0)
    gidx = jnp.concatenate(gidx_parts)
    wT = jnp.concatenate(w_parts, axis=1)

    g = buf.at[gidx].get(mode="promise_in_bounds")        # (L*P*BMLq, 4D)
    out = _fold_pallas(g.T, wT, D, BMLq, L * P)           # (D, BMLq) f32
    out = out.reshape(D, B, M, Lq_pad)[:, :, :, :Lq]
    return jnp.transpose(out.astype(dtype), (1, 3, 2, 0)).reshape(B, Lq, M * D)


def parity():
    shapes = ((15, 20), (8, 10), (4, 5), (10, 10))
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(1)
    value = jnp.array(rng.randn(B, s, M, D), jnp.float32)
    loc = jnp.array(rng.rand(B, 37, M, L, P, 2) * 1.2 - 0.1, jnp.float32)
    att = jax.nn.softmax(jnp.array(
        rng.randn(B, 37, M, L, P), jnp.float32).reshape(B, 37, M, -1),
        -1).reshape(B, 37, M, L, P)
    ref = jax.jit(lambda *a: ms_deform_attn_unpacked(a[0], shapes, a[1], a[2])
                  )(value, loc, att)
    v6 = jax.jit(lambda *a: msda_v6(a[0], shapes, a[1], a[2]))(value, loc, att)
    err = float(jnp.abs(ref - v6).max())
    print(f"parity v6 vs unpacked (f32, tiny): max|d| = {err:.2e}")
    assert err < 1e-4, err


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


def bench(fn, label, dtype):
    rng = np.random.RandomState(0)
    value = jnp.array(rng.randn(B, S, M, D), dtype)
    loc = jnp.array(rng.rand(B, LQ, M, L, P, 2), jnp.float32)
    att = jax.nn.softmax(jnp.array(
        rng.randn(B, LQ, M, L, P), jnp.float32).reshape(
            B, LQ, M, L * P), -1).reshape(B, LQ, M, L, P)

    @jax.jit
    def loop(value, loc, att):
        def body(i, acc):
            o = fn(value + i * jnp.asarray(1e-9, dtype), SHAPES, loc, att)
            return acc + o.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    ov = overhead()
    float(loop(value, loc, att))
    best = None
    for r in range(3):
        t0 = time.perf_counter()
        float(loop(value * (1 + (r + 1) * 1e-6), loc, att))
        dt = (time.perf_counter() - t0 - ov) / N
        best = dt if best is None else min(best, dt)
    print(f"{label:30s} {best*1e3:7.2f} ms")
    return best


if __name__ == "__main__":
    parity()
    for dt in (jnp.bfloat16,):
        bench(lambda v, s, l, a: _packed_forward(s, v, l, a),
              f"v4 per-level ({dt.__name__})", dt)
        bench(msda_v6, f"v6 fused+pallas ({dt.__name__})", dt)
