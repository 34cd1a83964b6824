#!/usr/bin/env python
"""Per-level gather rate at the real MSDA table sizes (800x1216, B=1, M=8).

Each encoder MSDA call gathers P*M*Lq = 646k rows per level, from per-level
packed tables of very different sizes. If small tables gather faster, the
overall op is dominated by level 0 and the win is restructuring IT.
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

import jax.numpy as jnp
import numpy as np

M = 8
D4 = 128            # packed row: 4 corners x 32
LQ = 20197
P = 4
NROWS = P * M * LQ  # 646,304 gathered rows per level
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


def bench_gather(R, dtype=jnp.bfloat16, nrows=NROWS):
    """R: packed rows per (head) slab; table (M*R, 128)."""
    rng = np.random.RandomState(0)
    buf = jnp.array(rng.randn(M * R, D4), dtype)
    idx = jnp.array(rng.randint(0, M * R, (nrows,)), jnp.int32)

    @jax.jit
    def loop(buf, idx):
        def body(i, acc):
            g = buf.at[(idx + i) % (M * R)].get(mode="promise_in_bounds")
            return acc + g.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    ov = overhead()
    float(loop(buf, idx))
    best = None
    for r in range(3):
        t0 = time.perf_counter()
        float(loop(buf, idx + r))
        dt = (time.perf_counter() - t0 - ov) / N
        best = dt if best is None else min(best, dt)
    mb = M * R * D4 * np.dtype(dtype).itemsize / 1e6
    print(f"R={R:6d} table={mb:7.1f}MB rows={nrows/1e6:.2f}M: "
          f"{best*1e3:6.2f} ms  {nrows/best/1e6:8.0f} rows/ms")
    return best


if __name__ == "__main__":
    # levels at 800x1216: (100,152) (50,76) (25,38) (13,19), packed (+2 pad)
    for R in (102 * 154, 52 * 78, 27 * 40, 15 * 21):
        bench_gather(R)
    # all four levels in ONE concatenated table
    bench_gather(102 * 154 + 52 * 78 + 27 * 40 + 15 * 21, nrows=4 * NROWS)


def bench_pattern(R, make_idx, label, nrows=NROWS):
    rng = np.random.RandomState(0)
    buf = jnp.array(rng.randn(M * R, D4), jnp.bfloat16)
    idx = jnp.array(make_idx(rng, nrows, M * R), jnp.int32)

    @jax.jit
    def loop(buf, idx):
        def body(i, acc):
            g = buf.at[(idx + i) % (M * R)].get(mode="promise_in_bounds")
            return acc + g.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    ov = overhead()
    float(loop(buf, idx))
    best = None
    for r in range(3):
        t0 = time.perf_counter()
        float(loop(buf, idx + r))
        dt = (time.perf_counter() - t0 - ov) / N
        best = dt if best is None else min(best, dt)
    print(f"{label:34s} R={R:6d}: {best*1e3:6.2f} ms "
          f"{nrows/best/1e6:8.0f} rows/ms")


def msda_like(rng, n, total):
    """p-major MSDA order: for each (p, m), queries sweep the level raster
    and each gathers near its own position (offset sigma ~ 8 rows)."""
    per = n // (P * M)
    out = []
    for p in range(P):
        for m in range(M):
            base = np.linspace(0, total // M - 1, per)
            noise = rng.randn(per) * 8
            out.append(((base + noise) % (total // M)) + m * (total // M))
    return np.concatenate(out).astype(np.int64)


if len(sys.argv) > 1 and sys.argv[1] == "patterns":
    R = 15708
    bench_pattern(R, lambda r, n, t: r.randint(0, t, n), "uniform random")
    bench_pattern(R, msda_like, "msda-like (raster + sigma8)")
    bench_pattern(R, lambda r, n, t: np.arange(n) % t, "pure sequential")
    sys.exit(0)
