#!/usr/bin/env python
"""Round 4: close the fold's fusion slack (VERDICT r3 next-step #1).

Today's decomposition (tools/profile_det_fine.py): v4 full op 9.17 ms,
gathers alone 6.27 ms -> fold+prep+pack = 2.90 ms vs a ~1.4 ms composable
floor (663 MB gather-output read + 21 MB write + 45 MB pack + small prep).
The Pallas fold is closed (v6: pallas_call forces a 1.6 ms relayout of the
column-major gather output). This lab tries XLA fold re-formulations that
keep the free transposed view but shape the expression tree for single-pass
fusion:

  v4       current: 4 corner-block mults over full P*BMLq width (bf16 acc),
           then P lane-block adds in f32
  flat16   r += gT[cD:(c+1)D, pW:(p+1)W] * wT[c, pW:(p+1)W] for all 16
           (c, p) blocks, f32 accumulate — one fusion over the output
  flat16b  same but products in bf16, accumulate f32
  einsum   reshape view (4, D, P*BMLq) + einsum over c with per-p adds
  wfirst   weights pre-broadcast to (4D, P*BMLq) and one big mult, then
           tree-sum of 16 blocks (maximum vector width per op)

All variants run INSIDE the full per-level op (pack + gather + fold) so
gather/fold fusion boundaries are real; parity vs ops/msda.py is asserted
to bf16 tolerance first.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from uninext_tpu.ops import msda as M

SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))
S = sum(h * w for h, w in SHAPES)
B, Mh, D, L, P = 1, 8, 32, 4, 4
LQ = S
N = 20


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


def timeit(name, fn, *args):
    ov = overhead()

    @jax.jit
    def loop(*a):
        def body(i, acc):
            pert = (a[0] + i * jnp.bfloat16(1e-9),) + a[1:]
            return acc + fn(*pert).astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    float(loop(*args))
    best = None
    for r in range(2):
        pert = tuple(x * (1 + (r + 1) * 1e-6) if jnp.issubdtype(
            x.dtype, jnp.floating) else x for x in args)
        t0 = time.perf_counter()
        float(loop(*pert))
        dt = (time.perf_counter() - t0 - ov) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best * 1e3:8.2f} ms", flush=True)
    return best


def packed_forward_variant(spatial_shapes, value, sampling_locations,
                           attention_weights, fold="v4"):
    B, S, Mh, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    dtype = value.dtype
    Lq_pad, pad_q, BMLq = M._pad_q_layout(B, Mh, Lq)

    value_t = jnp.transpose(value, (0, 2, 1, 3))
    packed = M._pack_levels(value_t, spatial_shapes)
    loc = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5))
    att = jnp.transpose(attention_weights, (0, 2, 1, 3, 4))
    idxs, ws = M._indices_weights(spatial_shapes, loc, att)

    f32 = jnp.float32
    out = 0
    for lvl in range(L):
        Rl = packed[lvl].shape[2]
        buf = packed[lvl].reshape(B * Mh * Rl, 4 * D)
        gidx = M._gather_index(idxs[lvl], Rl, pad_q)
        g = buf.at[gidx].get(mode="promise_in_bounds")   # (P*BMLq, 4D)
        gT = g.T                                         # free view
        w = ws[lvl].astype(dtype)
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        wT = jnp.transpose(w, (4, 3, 0, 1, 2)).reshape(4, -1)  # (4, P*BMLq)

        if fold == "v4":
            acc = (gT[0 * D:1 * D, :] * wT[0:1, :]
                   + gT[1 * D:2 * D, :] * wT[1:2, :]
                   + gT[2 * D:3 * D, :] * wT[2:3, :]
                   + gT[3 * D:4 * D, :] * wT[3:4, :])
            r = acc[:, 0 * BMLq:1 * BMLq].astype(f32)
            for p in range(1, P):
                r = r + acc[:, p * BMLq:(p + 1) * BMLq]
        elif fold == "flat16":
            r = jnp.zeros((D, BMLq), f32)
            for p in range(P):
                for c in range(4):
                    r = r + (gT[c * D:(c + 1) * D,
                                p * BMLq:(p + 1) * BMLq].astype(f32)
                             * wT[c:c + 1,
                                  p * BMLq:(p + 1) * BMLq].astype(f32))
        elif fold == "flat16b":
            r = jnp.zeros((D, BMLq), f32)
            for p in range(P):
                for c in range(4):
                    r = r + (gT[c * D:(c + 1) * D,
                                p * BMLq:(p + 1) * BMLq]
                             * wT[c:c + 1, p * BMLq:(p + 1) * BMLq]
                             ).astype(f32)
        elif fold == "einsum":
            g4 = gT.reshape(4, D, P * BMLq)
            acc = jnp.einsum("cdn,cn->dn", g4.astype(f32),
                             wT.astype(f32))
            r = acc[:, 0 * BMLq:1 * BMLq]
            for p in range(1, P):
                r = r + acc[:, p * BMLq:(p + 1) * BMLq]
        elif fold == "wfirst":
            wbig = jnp.repeat(wT, D, axis=0)             # (4D, P*BMLq)
            prod = gT * wbig
            r = jnp.zeros((D, BMLq), f32)
            for p in range(P):
                for c in range(4):
                    r = r + prod[c * D:(c + 1) * D,
                                 p * BMLq:(p + 1) * BMLq].astype(f32)
        else:
            raise ValueError(fold)
        out = out + r
    out = out.reshape(D, B, Mh, Lq_pad)[:, :, :, :Lq]
    return jnp.transpose(out.astype(dtype), (1, 3, 2, 0)).reshape(
        B, Lq, Mh * D)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    make = jax.jit(lambda k1, k2, k3: (
        jax.random.normal(k1, (B, S, Mh, D), jnp.bfloat16),
        jax.random.uniform(k2, (B, LQ, Mh, L, P, 2), jnp.bfloat16),
        jax.nn.softmax(jax.random.normal(
            k3, (B, LQ, Mh, L, P), jnp.bfloat16).reshape(B, LQ, Mh, L * P)
        ).reshape(B, LQ, Mh, L, P).astype(jnp.bfloat16)))
    value, loc, att = make(*ks)

    # parity vs the shipping op (bf16 tolerance: same math, new order)
    ref = jax.jit(lambda v, l, a: M.ms_deform_attn(v, SHAPES, l, a))(
        value, loc, att)
    for fold in ("flat16", "flat16b", "einsum", "wfirst"):
        got = jax.jit(functools.partial(
            packed_forward_variant, SHAPES, fold=fold))(value, loc, att)
        err = float(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        print(f"parity {fold:10s} max|d|={err:.3e}")
        assert err < 1e-2, (fold, err)

    timeit("v4 (shipping)",
           lambda v, l, a: M.ms_deform_attn(v, SHAPES, l, a),
           value, loc, att)
    for fold in ("v4", "flat16", "flat16b", "einsum", "wfirst"):
        timeit(f"variant fold={fold}",
               functools.partial(packed_forward_variant, SHAPES, fold=fold),
               value, loc, att)


if __name__ == "__main__":
    main()
