"""MSDA optimization lab: time competing gather formulations on the real chip.

Honest timing per the axon-backend protocol (see bench.py / memory notes):
N in-graph iterations with an iteration-dependent perturbation of the
*consumed* data (gather indices here, via perturbed sampling locations),
scalar readback, dispatch overhead subtracted.

Usage: python tools/msda_lab.py [variant ...]
"""
import sys
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from uninext_tpu.ops.msda import ms_deform_attn  # noqa: E402

SHAPES = ((100, 152), (50, 76), (25, 38), (13, 19))  # 800x1216 encoder levels
B, M, D, L, P = 1, 8, 32, 4, 4
S = sum(h * w for h, w in SHAPES)
Lq = S
N_ITERS = 50
N_REPS = 3


def honest_time(fn, args, perturb):
    """Time fn(args) N_ITERS times in one jit, perturbing via `perturb(i, args)`.

    Best of N_REPS outer measurements (each with fresh non-memoizable args)
    to ride out the ±0.5-1 s tunnel-dispatch noise of this sandbox.
    """
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

    float(loop(*args))                      # compile + first run
    best = float("inf")
    for k in range(1, N_REPS + 1):
        argsk = tuple(a * (1 + k * 1e-6) if a.dtype in (jnp.float32, jnp.bfloat16)
                      else a for a in args)
        t0 = time.perf_counter()
        float(loop(*argsk))
        best = min(best, time.perf_counter() - t0 - overhead)
    return best / N_ITERS * 1e3  # ms


def make_inputs(dtype=jnp.float32, seed=0):
    """Generated ON DEVICE (jitted PRNG): the tunnel's host->device transfer
    can degrade to <1 MB/s, which would dominate any host-side generation."""
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
    """Perturb sampling locations so gather indices are iteration-dependent."""
    value, loc, att = a
    return value, loc + i.astype(jnp.float32) * 1e-7, att


def _pack_levels(value, spatial_shapes, buf_dtype=None):
    """Per-level corner-packed padded buffers: list of (B, M, Rl, 4D)."""
    B, S, M, D = value.shape
    value_t = jnp.transpose(value, (0, 2, 1, 3))
    out, start = [], 0
    for (H, W) in spatial_shapes:
        slab = jax.lax.slice_in_dim(value_t, start, start + H * W, axis=2)
        slab = slab.reshape(B, M, H, W, D)
        slab = jnp.pad(slab, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        R = (H + 2) * (W + 2)
        flat = slab.reshape(B, M, R, D)
        packed = jnp.concatenate([
            flat,
            jnp.roll(flat, -1, axis=2),
            jnp.roll(flat, -(W + 2), axis=2),
            jnp.roll(flat, -(W + 3), axis=2),
        ], axis=-1)
        if buf_dtype is not None:
            packed = packed.astype(buf_dtype)
        out.append(packed)
        start += H * W
    return out


def _indices_weights(spatial_shapes, loc_bmqlp2, att_bmqlp):
    """Per-level local row index (B,M,Lq,P) + folded corner weights (B,M,Lq,P,4)."""
    idxs, ws = [], []
    for lvl, (H, W) in enumerate(spatial_shapes):
        l = loc_bmqlp2[:, :, :, lvl]
        a = att_bmqlp[:, :, :, lvl].astype(jnp.float32)
        x = l[..., 0].astype(jnp.float32) * W - 0.5
        y = l[..., 1].astype(jnp.float32) * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        in_range = ((x0 >= -1) & (x0 <= W - 1) & (y0 >= -1) & (y0 <= H - 1))
        a = a * in_range
        bx = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
        by = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)
        idxs.append(by * (W + 2) + bx)
        ws.append(jnp.stack([(1 - fx) * (1 - fy) * a, fx * (1 - fy) * a,
                             (1 - fx) * fy * a, fx * fy * a], axis=-1))
    return idxs, ws


def msda_levelmajor(value, spatial_shapes, loc, att, buf_dtype=None,
                    order="lqp"):
    """Per-level gathers with level-major (locality-friendly) sample order."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    dtype = value.dtype
    packed = _pack_levels(value, spatial_shapes, buf_dtype)
    locT = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
    attT = jnp.transpose(att, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, locT, attT)
    out = 0
    for lvl in range(L):
        Rl = packed[lvl].shape[2]
        buf = packed[lvl].reshape(B * M * Rl, 4 * D)
        idx = idxs[lvl]                      # (B, M, Lq, P)
        w = ws[lvl]                          # (B, M, Lq, P, 4)
        if order == "plq":
            idx = jnp.transpose(idx, (0, 1, 3, 2))
            w = jnp.transpose(w, (0, 1, 3, 2, 4))
        bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * M
              + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
        g = jnp.take(buf, (bm * Rl + idx).reshape(-1), axis=0)
        g = g.reshape(-1, 4, D).astype(jnp.float32)
        s = jnp.einsum("nc,ncd->nd", w.reshape(-1, 4), g,
                       preferred_element_type=jnp.float32)
        if order == "plq":
            s = s.reshape(B, M, P, Lq, D).sum(axis=2)
        else:
            s = s.reshape(B, M, Lq, P, D).sum(axis=3)
        out = out + s
    return jnp.transpose(out.astype(dtype), (0, 2, 1, 3)).reshape(B, Lq, M * D)


def msda_onehot_small(value, spatial_shapes, loc, att, rmax=1300,
                      buf_dtype=None):
    """Small levels via one-hot MXU matmul, big levels via row gather."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    dtype = value.dtype
    packed = _pack_levels(value, spatial_shapes, buf_dtype)
    locT = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
    attT = jnp.transpose(att, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, locT, attT)
    out = 0
    for lvl in range(L):
        Rl = packed[lvl].shape[2]
        idx = idxs[lvl]                      # (B, M, Lq, P)
        w = ws[lvl]
        if Rl <= rmax:
            # Gather-as-matmul on the MXU: weighted one-hot over rows, with
            # the P-sum and bilinear corner weights folded into the one-hot.
            onehot = (idx[..., None] ==
                      jax.lax.broadcasted_iota(jnp.int32, idx.shape + (Rl,),
                                               idx.ndim)).astype(jnp.bfloat16)
            buf = packed[lvl].astype(jnp.bfloat16)   # (B, M, Rl, 4D)
            wmat = jnp.einsum("bmqpc,bmqpr->bmcqr", w.astype(jnp.bfloat16),
                              onehot)                 # (B, M, 4, Lq, Rl)
            s = jnp.einsum("bmcqr,bmrcd->bmqd", wmat,
                           buf.reshape(B, M, Rl, 4, D),
                           preferred_element_type=jnp.float32)
        else:
            buf = packed[lvl].reshape(B * M * Rl, 4 * D)
            bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * M
                  + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
            g = jnp.take(buf, (bm * Rl + idx).reshape(-1), axis=0)
            g = g.reshape(-1, 4, D).astype(jnp.float32)
            s = jnp.einsum("nc,ncd->nd", w.reshape(-1, 4), g,
                           preferred_element_type=jnp.float32)
            s = s.reshape(B, M, Lq, P, D).sum(axis=3)
        out = out + s
    return jnp.transpose(out.astype(dtype), (0, 2, 1, 3)).reshape(B, Lq, M * D)


def msda_v2(value, spatial_shapes, loc, att):
    """Per-level small-table gathers in value dtype; one fused fold."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    dtype = value.dtype
    packed = _pack_levels(value, spatial_shapes)
    locT = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
    attT = jnp.transpose(att, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, locT, attT)
    out = 0
    for lvl in range(L):
        Rl = packed[lvl].shape[2]
        buf = packed[lvl].reshape(B * M * Rl, 4 * D)
        idx = idxs[lvl]                      # (B, M, Lq, P)
        bm = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * M
              + jax.lax.broadcasted_iota(jnp.int32, idx.shape, 1))
        g = jnp.take(buf, (bm * Rl + idx).reshape(-1), axis=0)
        g = g.reshape(B, M, Lq, P * 4, D)
        w = ws[lvl].reshape(B, M, Lq, P * 4).astype(dtype)
        out = out + jnp.einsum("bmqk,bmqkd->bmqd", w, g,
                               preferred_element_type=jnp.float32)
    return jnp.transpose(out.astype(dtype), (0, 2, 1, 3)).reshape(B, Lq, M * D)


def run(name, fn, dtype=jnp.float32):
    args = make_inputs(dtype)
    ms = honest_time(fn, args, perturb_loc)
    print(f"{name:40s} {ms:8.2f} ms")
    return ms


def main(variants):
    dev = jax.devices()[0]
    print(f"device: {dev.platform} S={S} Lq={Lq} rows={B*M*Lq*L*P/1e6:.2f}M")

    everything = not variants

    if everything or "current" in variants:
        run("current packed f32",
            lambda v, l, a: ms_deform_attn(v, SHAPES, l, a), jnp.float32)
    if everything or "current_bf16" in variants:
        run("current packed bf16",
            lambda v, l, a: ms_deform_attn(v, SHAPES, l, a), jnp.bfloat16)
    if everything or "lvlmajor" in variants:
        run("level-major per-level gathers (lqp)",
            lambda v, l, a: msda_levelmajor(v, SHAPES, l, a))
    if everything or "lvlmajor_plq" in variants:
        run("level-major per-level gathers (plq)",
            lambda v, l, a: msda_levelmajor(v, SHAPES, l, a, order="plq"))
    if everything or "lvlmajor_bf16buf" in variants:
        run("level-major, bf16 packed buffer",
            lambda v, l, a: msda_levelmajor(v, SHAPES, l, a,
                                            buf_dtype=jnp.bfloat16))
    if everything or "onehot" in variants:
        run("one-hot MXU small levels (rmax=1300)",
            lambda v, l, a: msda_onehot_small(v, SHAPES, l, a))
    if everything or "onehot4k" in variants:
        run("one-hot MXU small levels (rmax=4100)",
            lambda v, l, a: msda_onehot_small(v, SHAPES, l, a, rmax=4100))
    if everything or "v2" in variants:
        run("v2 per-level dtype-native f32",
            lambda v, l, a: msda_v2(v, SHAPES, l, a), jnp.float32)
    if everything or "v2_bf16" in variants:
        run("v2 per-level dtype-native bf16",
            lambda v, l, a: msda_v2(v, SHAPES, l, a), jnp.bfloat16)

    # numerics cross-check vs the shipping op
    v, l, a = make_inputs()
    ref = ms_deform_attn(v, SHAPES, l, a)
    for nm, f in [("lvlmajor", msda_levelmajor),
                  ("onehot", msda_onehot_small)]:
        got = f(v, SHAPES, l, a)
        err = float(jnp.abs(got - ref).max())
        print(f"max|{nm} - ref| = {err:.2e}")


if __name__ == "__main__":
    main(sys.argv[1:])
