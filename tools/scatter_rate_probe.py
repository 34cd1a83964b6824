#!/usr/bin/env python
"""Scatter-add rate characterization on v5e (the MSDA custom-VJP bottleneck).

Sweeps (row count, row bytes, dtype, table rows, index pattern) for
`tbl.at[idx].add(u)` and prints rows/us — looking for emitter regimes like
the gather's ~2M-row cliff (docs/PERF.md round-2 notes).

Usage: python tools/scatter_rate_probe.py
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

N_IT = 10


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


def bench(n_rows, width, dt, tbl_rows, pattern, sorted_idx=False,
          unique=False):
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (n_rows, width), dt)
    if pattern == "random":
        idx = jax.random.randint(key, (n_rows,), 0, tbl_rows)
    elif pattern == "clustered":   # msda-like: nearby rows for nearby samples
        base = (jnp.arange(n_rows) * tbl_rows // n_rows)
        idx = jnp.clip(base + jax.random.randint(key, (n_rows,), -8, 8),
                       0, tbl_rows - 1)
    if sorted_idx:
        idx = jnp.sort(idx)
    idx = idx.astype(jnp.int32)
    mode = "promise_in_bounds"

    @jax.jit
    def loop(u, idx):
        def body(i, acc):
            tbl = jnp.zeros((tbl_rows, width), dt)
            tbl = tbl.at[(idx + i) % tbl_rows].add(
                u + i * jnp.array(1e-7, dt), mode=mode,
                unique_indices=unique)
            return acc + tbl[0].sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, N_IT, body, jnp.float32(0))

    ov = overhead()
    float(loop(u, idx))
    best = None
    for r in range(2):
        t0 = time.perf_counter()
        float(loop(u * (1 + r * 1e-6), idx))
        dt_s = (time.perf_counter() - t0 - ov) / N_IT
        best = dt_s if best is None else min(best, dt_s)
    rate = n_rows / best / 1e6
    print(f"rows={n_rows/1e6:5.2f}M w={width:4d} {dt.__name__:8s} "
          f"tbl={tbl_rows/1e3:6.0f}k {pattern:9s} "
          f"sorted={int(sorted_idx)} uniq={int(unique)}: "
          f"{best*1e3:7.2f} ms  {rate:6.0f} rows/us", flush=True)
    return best


def main():
    TBL = 251328  # B*M*R level-0 at bs=2
    for n in (323584, 647168, 1294336, 2588672, 5177344):
        bench(n, 128, jnp.float32, TBL, "random")
    print("--- width/dtype at 1.29M rows")
    for w, d in ((128, jnp.bfloat16), (256, jnp.bfloat16), (64, jnp.float32),
                 (256, jnp.float32), (512, jnp.float32)):
        bench(1294336, w, d, TBL, "random")
    print("--- patterns at 1.29M rows, 128 f32")
    bench(1294336, 128, jnp.float32, TBL, "clustered")
    bench(1294336, 128, jnp.float32, TBL, "random", sorted_idx=True)
    bench(1294336, 128, jnp.float32, TBL, "random", sorted_idx=True,
          unique=False)
    print("--- unique sorted (segment-sum endgame) at 1.29M rows")
    bench(1294336, 128, jnp.float32, 1294336 + 1, "clustered",
          sorted_idx=True, unique=True)
    print("--- table size at 1.29M rows")
    for tbl in (65536, 251328, 1000000, 4000000):
        bench(1294336, 128, jnp.float32, tbl, "random")


if __name__ == "__main__":
    main()
