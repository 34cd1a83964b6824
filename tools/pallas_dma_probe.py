#!/usr/bin/env python
"""Probe Mosaic's scalar-prefetch / dynamic-DMA paths for the MSDA gather.

Round-2 established (tools/pallas_gather_probe.py) that ANY dynamic vector
VMEM addressing — jnp.take, take_along_axis, loop-var stores — is rejected
by this build's Mosaic. VERDICT r2 #2(a) asks for the OTHER Mosaic path:
scalar-prefetched indices driving *block-level* DMA copies with dynamic
source addresses (descriptor engine, not vector ISA). Three probes:

  1. dma_hbm:   per-row HBM->VMEM `make_async_copy` with a traced source
                index read from SMEM, K outstanding copies per tile.
  2. dma_vmem:  same but the table is VMEM-resident (local copy engine).
  3. index_map: PrefetchScalarGridSpec BlockSpec index_map reading the
                prefetched scalar ref — the pipelined "one dynamic block
                per grid step" form.

Each probe prints ACCEPTED + measured rows/us (scaled to the encoder-scale
2.59M-row gather) or REJECTED with the Mosaic error. The XLA fast-regime
gather to beat runs at ~500 rows/us (docs/PERF.md round-2 notes).

RESULT (2026-08-18, axon v5e, jax 0.8.x remote AOT helper) — all three
REJECTED, plus `probe0` controls isolating the trigger:
  * static-src  `make_async_copy` (any memspace, plain or prefetch grid,
    single sem or sem arrays):                                   ACCEPTED
  * DYNAMIC-src `make_async_copy` (`buf.at[pl.ds(j, 8)]` with a traced j
    read from SMEM — the one form a gather kernel needs):        REJECTED
    (MosaicError: remote_compile HTTP 500, tpu_compile_helper crash)
  * PrefetchScalarGridSpec BlockSpec index_map reading the prefetched
    scalar ref (dynamic block per grid step):                    REJECTED
So the scalar-prefetch/dynamic-block DMA path is broken in this build the
same way vector VMEM gathers are (tools/pallas_gather_probe.py): every
dynamic-address form crashes the AOT compile helper. A fused Pallas
gather+fold kernel remains impossible here; the viable Pallas piece is the
FOLD (static block layout) consuming XLA's gather output — see ops/msda.py
v6. Re-run this probe on the next jax/libtpu upgrade.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 15708        # level-0 table rows at 800x1216 (one head)
D4 = 128         # packed row width (4 corners x 32)
K = 32           # rows per tile (static unroll)
TILES = 4096     # total rows probed = K * TILES = 131072
ENC_ROWS = 2.59e6


def honest_ms(fn, *args, iters=10):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(a[0] + i * 0, *a[1:])
            return acc + out.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    trivial = jax.jit(lambda x: x.astype(jnp.float32).sum())
    float(trivial(args[0]))
    t0 = time.perf_counter(); float(trivial(args[0] + 1))
    ovh = time.perf_counter() - t0
    float(loop(*args))
    best = float("inf")
    for k in range(3):
        a2 = tuple(x + (k + 1) if jnp.issubdtype(x.dtype, jnp.integer)
                   else x * (1 + 1e-6) for x in args)
        t0 = time.perf_counter()
        float(loop(*a2))
        best = min(best, time.perf_counter() - t0 - ovh)
    return best / iters * 1e3


def report(name, ms, rows):
    rate = rows / ms / 1e3
    print(f"{name}: ACCEPTED  {ms:.2f} ms for {rows/1e6:.2f}M rows "
          f"-> {rate:.0f} rows/us; encoder-scale 2.59M rows ~ "
          f"{ms * ENC_ROWS / rows:.1f} ms  (XLA fast regime: ~5.1 ms)")


# ------------------------------------------------------------- probe 1/2
def dma_kernel(idx_ref, buf_ref, out_ref, scratch, sems):
    pid = pl.program_id(0)

    def cp(k):
        j = idx_ref[pid * K + k]
        return pltpu.make_async_copy(
            buf_ref.at[pl.ds(j, 1), :], scratch.at[pl.ds(k, 1), :],
            sems.at[k])

    for k in range(K):
        cp(k).start()
    for k in range(K):
        cp(k).wait()
    s = scratch[:].astype(jnp.float32).sum(axis=0, keepdims=True)
    out_ref[:] = jnp.broadcast_to(s, out_ref.shape)


def probe_dma(space, name):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TILES,),
        in_specs=[pl.BlockSpec(memory_space=space)],
        out_specs=pl.BlockSpec((8, D4), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, D4), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((K,))],
    )
    f = pl.pallas_call(
        dma_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TILES * 8, D4), jnp.float32))
    buf = jnp.array(np.random.randn(R, D4), jnp.bfloat16)
    idx = jnp.array(np.random.randint(0, R, (TILES * K,)), jnp.int32)

    def call(idx, buf):
        return f(idx, buf)
    out = call(idx, buf)
    jax.block_until_ready(out)
    report(name, honest_ms(call, idx, buf), TILES * K)


# ------------------------------------------------------------- probe 3
def imap_kernel(idx_ref, row_ref, out_ref):
    out_ref[:] = row_ref[:].astype(jnp.float32)


def probe_index_map():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TILES * K,),
        in_specs=[pl.BlockSpec((8, D4), lambda i, idx: (idx[i], 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, D4), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        imap_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TILES * K * 8, D4), jnp.float32))
    buf = jnp.array(np.random.randn(R, D4), jnp.bfloat16)
    # dynamic BLOCK index: 8-row granularity (Mosaic requires sublane
    # blocks divisible by 8 — a per-row kernel would round + post-select)
    idx = jnp.array(np.random.randint(0, R // 8, (TILES * K,)), jnp.int32)

    def call(idx, buf):
        return f(idx, buf)
    out = call(idx, buf)
    jax.block_until_ready(out)
    report("probe3 index_map block/step", honest_ms(call, idx, buf), TILES * K)


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "3"]
    for w in which:
        try:
            if w == "1":
                probe_dma(pl.ANY, "probe1 dma HBM->VMEM dyn-src")
            elif w == "2":
                probe_dma(pltpu.VMEM, "probe2 dma VMEM->VMEM dyn-src")
            elif w == "3":
                probe_index_map()
        except Exception as e:
            print(f"probe{w} REJECTED: {type(e).__name__}: {str(e)[:600]}")
