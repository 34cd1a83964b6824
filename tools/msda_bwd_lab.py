#!/usr/bin/env python
"""MSDA backward lab (round 2): the AD transpose of the packed-gather op is
~7x the forward; find where the time goes and prototype a custom VJP.

Sections (each an in-graph fori_loop, overhead-subtracted):
  fwd          forward only (baseline, ~9 ms bs=1 bf16)
  all          value_and_grad wrt (value, loc, att)   <- the 155 ms bs=2 f32
  dvalue       grad wrt value only
  dlocatt      grad wrt (loc, att) only
  scatter      raw scatter-add of (P*BMLq, 4D) rows into the packed table
  gather       raw regather (the fwd gathers alone)

Usage: python tools/msda_bwd_lab.py [bs] [f32|bf16] [sections...]
"""
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

from uninext_tpu.ops import msda

N = 10
SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))
S = sum(h * w for h, w in SHAPES)
M, D, L, P = 8, 32, 4, 4


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


def timeit(name, loop, *args):
    ov = overhead()
    t0 = time.perf_counter()
    float(loop(*args))
    print(f"  [{name} compile+first: {time.perf_counter() - t0:.1f}s]",
          flush=True)
    best = None
    for r in range(2):
        pert = tuple(a * (1 + (r + 1) * 1e-6)
                     if isinstance(a, jnp.ndarray)
                     and jnp.issubdtype(a.dtype, jnp.floating) else a
                     for a in args)
        t0 = time.perf_counter()
        float(loop(*pert))
        dt = (time.perf_counter() - t0 - ov) / N
        best = dt if best is None else min(best, dt)
    print(f"{name:22s} {best * 1e3:8.1f} ms", flush=True)
    return best


def main(argv):
    B = int(argv[0]) if argv else 2
    dt = jnp.bfloat16 if (len(argv) > 1 and argv[1] == "bf16") else jnp.float32
    sections = argv[2:]
    every = not sections
    print(f"bs={B} dtype={dt.__name__} S={S}", flush=True)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        v = jax.random.normal(ks[0], (B, S, M, D), dt)
        loc = jax.random.uniform(ks[1], (B, S, M, L, P, 2), dt)
        att = jax.random.uniform(ks[2], (B, S, M, L, P), dt)
        dy = jax.random.normal(ks[3], (B, S, M * D), dt)
        return v, loc, att / att.sum((-1, -2), keepdims=True), dy
    v, loc, att, dy = gen(jax.random.PRNGKey(4))
    jax.block_until_ready(v)

    def mk_loop(f):
        @jax.jit
        def loop(*args):
            def body(i, acc):
                return acc + f(i, *args)
            return jax.lax.fori_loop(0, N, body, jnp.float32(0))
        return loop

    if every or "fwd" in sections:
        timeit("fwd", mk_loop(
            lambda i, v, loc, att: msda.ms_deform_attn(
                v, SHAPES, loc + i * jnp.array(1e-7, dt), att)
            .sum().astype(jnp.float32)), v, loc, att)

    def vjp_loop(argnums, name):
        # perturb value, loc AND the cotangent each iteration so no piece of
        # the backward is loop-invariant (XLA hoists invariant scatters)
        def f(i, v, loc, att, dy):
            eps = i * jnp.array(1e-7, dt)
            def g(*a):
                return (msda.ms_deform_attn(a[0], SHAPES, a[1], a[2])
                        * (dy.reshape(B, S, M * D) + eps)).sum()
            args = (v + eps, loc + eps, att)
            grads = jax.grad(g, argnums=argnums)(*args)
            return sum(x.sum().astype(jnp.float32) for x in grads)
        timeit(name, mk_loop(f), v, loc, att, dy)

    if every or "all" in sections:
        vjp_loop((0, 1, 2), "fwd+bwd all")

    if every or "ad" in sections:
        # AD of the packed forward, bypassing the custom VJP (the old path)
        def f(i, v, loc, att, dy):
            eps = i * jnp.array(1e-7, dt)
            def g(*a):
                return (msda._packed_forward(SHAPES, a[0], a[1], a[2])
                        * (dy.reshape(B, S, M * D) + eps)).sum()
            grads = jax.grad(g, argnums=(0, 1, 2))(v + eps, loc + eps, att)
            return sum(x.sum().astype(jnp.float32) for x in grads)
        timeit("fwd+bwd AD(packed)", mk_loop(f), v, loc, att, dy)
    if every or "dvalue" in sections:
        vjp_loop((0,), "fwd+bwd dvalue")
    if every or "dlocatt" in sections:
        vjp_loop((1, 2), "fwd+bwd dlocatt")

    # raw primitive costs at per-level scale, all 4 levels
    import math
    q_align = 128 // math.gcd(B * M, 128)
    Lq_pad = -(-S // q_align) * q_align
    BMLq = B * M * Lq_pad

    @jax.jit
    def gen_raw(key):
        ks = jax.random.split(key, 2 * L)
        us, idxs = [], []
        for lvl, (H, W) in enumerate(SHAPES):
            R = (H + 2) * (W + 2)
            us.append(jax.random.normal(ks[2 * lvl], (P * BMLq, 4 * D), dt))
            idxs.append(jax.random.randint(
                ks[2 * lvl + 1], (P * BMLq,), 0, B * M * R))
        return us, idxs
    us, idxs = gen_raw(jax.random.PRNGKey(5))
    jax.block_until_ready(us)

    if every or "scatter" in sections:
        def f(i, us, idxs):
            acc = jnp.float32(0)
            for lvl, (H, W) in enumerate(SHAPES):
                R = (H + 2) * (W + 2)
                tbl = jnp.zeros((B * M * R, 4 * D), dt)
                tbl = tbl.at[idxs[lvl]].add(
                    us[lvl] + i * jnp.array(1e-7, dt),
                    mode="promise_in_bounds")
                acc += tbl.sum().astype(jnp.float32)
            return acc
        timeit("scatter 4lvl", mk_loop(f), us, idxs)

    if every or "gather" in sections:
        def f(i, us, idxs):
            acc = jnp.float32(0)
            for lvl, (H, W) in enumerate(SHAPES):
                R = (H + 2) * (W + 2)
                tbl = (us[lvl][:B * M * R]
                       if P * BMLq >= B * M * R else
                       jnp.pad(us[lvl], ((0, B * M * R - P * BMLq), (0, 0))))
                g = tbl.at[(idxs[lvl] + i) % (B * M * R)].get(
                    mode="promise_in_bounds")
                acc += g.sum().astype(jnp.float32)
            return acc
        timeit("gather 4lvl", mk_loop(f), us, idxs)


if __name__ == "__main__":
    main(sys.argv[1:])
