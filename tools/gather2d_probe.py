#!/usr/bin/env python
"""Probe XLA's 2-D slice gather for MSDA (v7 candidate).

Instead of corner-packing the table 4x (v4) and gathering 256B rows, gather
a (2, 2D) slice per sample from the UNPACKED (B*M*(H+2), (W+2)*D) table:
one gather item covers pixels (y..y+1, x..x+1) = all four bilinear corners.
Same item count and bytes as v4, but the table is 4x smaller (level-0 8MB
vs 32MB — below the ~43MB slow-table cliff) and the emitter path is the
general gather (2-D slices), not the row-gather special case. Measures
items/us for per-level and level-stacked variants + the fold-consumability
of the (N, 2, 2D) output.

RESULT (2026-08-18, axon v5e): UNUSABLE on this backend. The encoder-scale
(646k-item) 2-D slice gather crashed the TPU worker outright
("UNAVAILABLE: TPU worker process crashed or restarted ... kernel fault"),
and a 4k-item small-scale correctness check hung past a 2-minute timeout.
The general-slice gather emitter is broken here; v4's row gathers stay.
Re-probe on the next jax/libtpu upgrade.
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

SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))
B, M, D, L, P = 1, 8, 32, 4, 4
LQ = sum(h * w for h, w in SHAPES)
N_IT = 20


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


def timeit(fn, label, *args, items=None):
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
    rate = "" if not items else (f"  ({items/1e6:.2f}M items, "
                                 f"{items/best/1e9:.0f} items/us)")
    print(f"{label:44s} {best*1e3:7.2f} ms{rate}")
    return best


def gather2d(table, starts, slice_rows, slice_cols):
    """table (Rows, Cols); starts (N, 2) int32 -> (N, slice_rows, slice_cols)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return jax.lax.gather(
        table, starts, dn, (slice_rows, slice_cols),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    NPL = B * M * LQ * P                      # items per level = 646k

    # per-level 2D tables: (B*M*(H+2), (W+2)*D)
    print(f"items/level = {NPL/1e6:.2f}M; table MBs:",
          [round(B*M*(h+2)*(w+2)*D*2/1e6, 1) for h, w in SHAPES])

    for (H, W) in SHAPES[:2]:                 # level 0 and level 1
        RT, CT = B * M * (H + 2), (W + 2) * D
        table = jnp.array(rng.randn(RT, CT), jnp.bfloat16)
        ys = rng.randint(0, H, NPL)
        xs = rng.randint(0, W, NPL)
        bm = rng.randint(0, B * M, NPL)
        starts = jnp.array(np.stack([bm * (H + 2) + ys, xs * D], 1), jnp.int32)
        timeit(lambda t, s: gather2d(t, s, 2, 2 * D).sum(),
               f"2D slice (2,{2*D}) gather, level {H}x{W}",
               table, starts, items=NPL)
        # control: row gather of 256B rows from the equivalent packed table
        packed = jnp.array(rng.randn(B * M * (H + 2) * (W + 2), 4 * D),
                           jnp.bfloat16)
        ridx = jnp.array(rng.randint(0, packed.shape[0], NPL), jnp.int32)
        timeit(lambda t, i: t.at[i].get(mode="promise_in_bounds").sum(),
               f"v4 row gather control, level {H}x{W}",
               packed, ridx, items=NPL)

    # all-level stacked on the row axis with a COMMON column width
    # (pad every level to the level-0 width)
    CT = (SHAPES[0][1] + 2) * D
    rows = sum(B * M * (h + 2) for h, w in SHAPES)
    table = jnp.array(rng.randn(rows, CT), jnp.bfloat16)
    NS = NPL * L
    ys = rng.randint(0, rows - 2, NS)
    xs = rng.randint(0, (SHAPES[-1][1]) * D, NS)
    starts = jnp.array(np.stack([ys, xs], 1), jnp.int32)
    timeit(lambda t, s: gather2d(t, s, 2, 2 * D).sum(),
           "2D slice stacked all levels (2.59M items)",
           table, starts, items=NS)
