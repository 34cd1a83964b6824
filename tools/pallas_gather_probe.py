"""Probe what gather patterns Mosaic accepts/performs in this jax build.

Each probe is a tiny standalone Pallas kernel shaped like the MSDA inner
problem: gather N rows of 128 from a VMEM-resident packed buffer.
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 5632          # packed rows resident in VMEM (levels 1-3 scale)
TQ = 512          # queries per grid step
SAMP = 16         # L*P samples per query
M_STEPS = 16      # grid steps (heads x query tiles)
D = 32


def honest_ms(fn, *args, iters=20):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(a[0] + i.astype(a[0].dtype) * 0, *a[1:])  # keep deps
            return acc + out.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    trivial = jax.jit(lambda x: x.astype(jnp.float32).sum())
    float(trivial(args[0]))
    t0 = time.perf_counter(); float(trivial(args[0] + 1)); ovh = time.perf_counter() - t0
    float(loop(*args))
    best = float("inf")
    for k in range(3):
        a2 = tuple(x + (k + 1) if jnp.issubdtype(x.dtype, jnp.integer) else x * (1 + 1e-6)
                   for x in args)
        t0 = time.perf_counter()
        float(loop(*a2))
        best = min(best, time.perf_counter() - t0 - ovh)
    return best / iters * 1e3


# ---------------------------------------------------------------- probe 1
def scalar_loop_kernel(idx_ref, buf_ref, out_ref, scratch):
    n = TQ * SAMP
    pid = pl.program_id(0)
    def body(i, _):
        j = idx_ref[pid, i]
        scratch[pl.ds(i, 1), :] = buf_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, n, body, 0)
    g = scratch[...].reshape(TQ, SAMP, 4, D).astype(jnp.float32)
    out_ref[0] = g.sum(axis=(1, 2))


def probe_scalar_loop():
    buf = jnp.array(np.random.randn(R, 4 * D), jnp.bfloat16)
    idx = jnp.array(np.random.randint(0, R, (M_STEPS, TQ * SAMP)), jnp.int32)
    f = pl.pallas_call(
        scalar_loop_kernel,
        grid=(M_STEPS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, 4 * D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M_STEPS, TQ, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TQ * SAMP, 4 * D), jnp.bfloat16)],
    )
    def call(idx, buf):
        return f(idx.reshape(M_STEPS, TQ * SAMP), buf)
    out = call(idx, buf)
    rows = M_STEPS * TQ * SAMP
    ms = honest_ms(call, idx, buf)
    print(f"probe1 scalar-loop gather: OK {ms:.2f} ms for {rows/1e6:.2f}M rows "
          f"-> {rows/ms/1e3:.0f} rows/us... scaled to 2.59M rows: {ms*2.59e6/rows:.1f} ms")


# ---------------------------------------------------------------- probe 2
def vector_gather_kernel(idx_ref, buf_ref, out_ref):
    pid = pl.program_id(0)
    idx = idx_ref[pid]                      # (TQ*SAMP,) int32 in VMEM
    g = jnp.take(buf_ref[...], idx, axis=0)  # vector gather
    out_ref[0] = g.reshape(TQ, SAMP, 4, D).astype(jnp.float32).sum(axis=(1, 2))


def probe_vector_gather():
    buf = jnp.array(np.random.randn(R, 4 * D), jnp.bfloat16)
    idx = jnp.array(np.random.randint(0, R, (M_STEPS, TQ * SAMP)), jnp.int32)
    f = pl.pallas_call(
        vector_gather_kernel,
        grid=(M_STEPS,),
        in_specs=[
            pl.BlockSpec((M_STEPS, TQ * SAMP), lambda i: (0, 0)),
            pl.BlockSpec((R, 4 * D), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((M_STEPS, TQ, D), jnp.float32),
    )
    def call(idx, buf):
        return f(idx, buf)
    out = call(idx, buf)
    rows = M_STEPS * TQ * SAMP
    ms = honest_ms(call, idx, buf)
    print(f"probe2 vector gather (jnp.take): OK {ms:.2f} ms "
          f"-> scaled to 2.59M rows: {ms*2.59e6/rows:.1f} ms")


# ---------------------------------------------------------------- probe 3
def onehot_kernel(idx_ref, w_ref, buf_ref, out_ref):
    pid = pl.program_id(0)
    idx = idx_ref[pid].reshape(TQ * SAMP, 1)          # (N, 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TQ * SAMP, R), 1)
    oh = (iota == idx).astype(jnp.bfloat16)           # (N, R)
    g = jnp.dot(oh, buf_ref[...],                     # MXU gather
                preferred_element_type=jnp.float32)   # (N, 4D)
    w = w_ref[pid].reshape(TQ * SAMP, 4)
    g = g.reshape(TQ * SAMP, 4, D) * w[..., None]
    out_ref[0] = g.reshape(TQ, SAMP * 4, D).sum(axis=1)


def probe_onehot(r=1408):
    global R
    oldR = R
    R = r
    try:
        buf = jnp.array(np.random.randn(R, 4 * D), jnp.bfloat16)
        idx = jnp.array(np.random.randint(0, R, (M_STEPS, TQ * SAMP)), jnp.int32)
        w = jnp.array(np.random.rand(M_STEPS, TQ * SAMP, 4), jnp.float32)
        f = pl.pallas_call(
            onehot_kernel,
            grid=(M_STEPS,),
            in_specs=[
                pl.BlockSpec((M_STEPS, TQ * SAMP), lambda i: (0, 0)),
                pl.BlockSpec((M_STEPS, TQ * SAMP, 4), lambda i: (0, 0, 0)),
                pl.BlockSpec((R, 4 * D), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TQ, D), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((M_STEPS, TQ, D), jnp.float32),
        )
        def call(idx, w, buf):
            return f(idx, w, buf)
        out = call(idx, w, buf)
        rows = M_STEPS * TQ * SAMP
        ms = honest_ms(call, idx, w, buf)
        print(f"probe3 one-hot MXU (R={R}): OK {ms:.2f} ms "
              f"-> {rows/1e6:.2f}M rows; per-2.59M-rows-equivalent: {ms*2.59e6/rows:.1f} ms")
    finally:
        R = oldR


if __name__ == "__main__":
    which = sys.argv[1:] or ["1", "2", "3"]
    for w in which:
        try:
            if w == "1":
                probe_scalar_loop()
            elif w == "2":
                probe_vector_gather()
            elif w == "3":
                probe_onehot()
        except Exception as e:
            print(f"probe{w} FAILED: {type(e).__name__}: {str(e)[:500]}")
