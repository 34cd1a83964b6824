#!/usr/bin/env python
"""MSDA v9 lab (round 4): scheduling handles for the G=8 L0 head-split.

v8 (round 3) proved the ONLY fast-regime lever for the 32MB level-0 table
is a G=8 per-head split (4MB tables, 2.9x on the isolated L0 stage) but the
full op regressed 8.1 -> 12.2 ms because XLA scheduled the 8 unrolled
pack+gather+fold chains pathologically. This lab tries every scheduling
handle XLA/JAX actually exposes:

  v4        shipping baseline (ops/msda.py)
  v8        round-3 unrolled per-head packs (reproduce the regression)
  slice     ONE full pack (efficient wide ops), 8 gathers each addressing a
            contiguous per-head 4MB slice of the packed buffer — if the
            emitter sees the slice (not the parent) as the table, this is
            fast-regime rows with none of v8's narrow per-head pack ops
  scan      lax.scan over heads: pack+gather+fold one head per iteration —
            forces a serial schedule
  barrier   v8 unrolled, but each head's chain threaded through
            jax.lax.optimization_barrier with the previous head's result —
            forbids interleaving without a loop

All variants are bit-identical math to v4 (same rows, same fold order);
parity asserted in f32 before timing. In-model timing perturbs BOTH value
and loc per iteration so the pack is never loop-invariant.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp

from uninext_tpu.ops.msda import (ms_deform_attn, _pack_levels,
                                  _indices_weights, _pad_q_layout,
                                  _gather_index)
sys.path.insert(0, "/root/repo/tools")
from msda_v8_lab import (SHAPES, B, M, D, L, P, S, Lq, honest_time,
                         make_inputs, perturb_value_loc, _pack_one_level,
                         msda_v8)

FAST_LEVELS = (True, False, False, False)   # split only L0 at 800x1216


def _fold_block(gT, wT, D_, P_, BMLq):
    acc = (gT[0 * D_:1 * D_] * wT[0:1] + gT[1 * D_:2 * D_] * wT[1:2]
           + gT[2 * D_:3 * D_] * wT[2:3] + gT[3 * D_:4 * D_] * wT[3:4])
    r = acc[:, :BMLq].astype(jnp.float32)
    for p in range(1, P_):
        r = r + acc[:, p * BMLq:(p + 1) * BMLq]
    return r


def msda_v9(value, spatial_shapes, loc, att, mode="slice"):
    """v4 with the level-0 gather split per head, scheduling per `mode`."""
    B_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = loc.shape
    dtype = value.dtype
    Lq_pad, pad_q, BMLq = _pad_q_layout(B_, M_, Lq_)
    BLq = B_ * Lq_pad

    value_t = jnp.transpose(value, (0, 2, 1, 3))
    locT = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))
    attT = jnp.transpose(att, (0, 2, 1, 3, 4))
    idxs, ws = _indices_weights(spatial_shapes, locT, attT)
    packed = _pack_levels(value_t, spatial_shapes)

    out = 0
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        R = (H + 2) * (W + 2)
        w = ws[lvl].astype(dtype)
        if pad_q:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_q), (0, 0), (0, 0)))
        if not FAST_LEVELS[lvl]:
            buf = packed[lvl].reshape(B_ * M_ * R, 4 * D_)
            gidx = _gather_index(idxs[lvl], R, pad_q)
            g = buf.at[gidx].get(mode="promise_in_bounds")
            wT = jnp.transpose(w, (4, 3, 0, 1, 2)).reshape(4, -1)
            out = out + _fold_block(g.T, wT, D_, P_, BMLq)
            start += H * W
            continue

        # ---- split level: per-head 4MB tables ----
        idx = idxs[lvl]                                   # (B, M, Lq, P)
        if pad_q:
            idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        # per-head flat index into a (B*R, 4D) table (B=1 in serving)
        bidx = (jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0) * R + idx)

        def head_result(h, tbl, carry=None):
            """tbl: (B*R, 4D) this head's packed table."""
            ih = jnp.transpose(bidx[:, h], (2, 0, 1)).reshape(-1)  # p-major
            if carry is not None:
                tbl, ih = jax.lax.optimization_barrier((tbl, ih if carry is
                                                        None else ih))
            g = tbl.at[ih].get(mode="promise_in_bounds")
            wh = jnp.transpose(w[:, h], (3, 2, 0, 1)).reshape(4, -1)
            return _fold_block(g.T, wh, D_, P_, B_ * Lq_pad)  # (D, BLq)

        if mode == "slice":
            big = packed[lvl]                             # (B, M, R, 4D)
            parts = [head_result(
                h, jax.lax.slice_in_dim(big, h, h + 1, axis=1).reshape(
                    B_ * R, 4 * D_)) for h in range(M_)]
            r = jnp.stack(parts, 1)                       # (D, M, BLq)
        elif mode == "scan":
            big = jnp.transpose(packed[lvl], (1, 0, 2, 3)).reshape(
                M_, B_ * R, 4 * D_)
            bidx_h = jnp.transpose(bidx, (1, 3, 0, 2)).reshape(M_, -1)
            w_h = jnp.transpose(w, (1, 4, 3, 0, 2)).reshape(M_, 4, -1)

            def body(_, xs):
                tbl, ih, wh = xs
                g = tbl.at[ih].get(mode="promise_in_bounds")
                return None, _fold_block(g.T, wh, D_, P_, B_ * Lq_pad)

            _, r = jax.lax.scan(body, None, (big, bidx_h, w_h))
            r = jnp.transpose(r, (1, 0, 2))               # (D, M, BLq)
        elif mode == "barrier":
            parts = []
            prev = None
            for h in range(M_):
                slab = jax.lax.slice_in_dim(value_t, h, h + 1, axis=1)
                if prev is not None:
                    slab, _ = jax.lax.optimization_barrier((slab, prev))
                tbl = _pack_one_level(slab, start, H, W).reshape(
                    B_ * R, 4 * D_)
                rh = head_result(h, tbl)
                prev = rh
                parts.append(rh)
            r = jnp.stack(parts, 1)
        elif mode == "v8":
            raise RuntimeError("use msda_v8 directly")
        else:
            raise ValueError(mode)
        out = out + r.reshape(D_, B_, M_, Lq_pad).reshape(D_, BMLq)
        start += H * W

    out = jnp.asarray(out).reshape(D_, B_, M_, Lq_pad)[:, :, :, :Lq_]
    return jnp.transpose(out.astype(dtype),
                         (1, 3, 2, 0)).reshape(B_, Lq_, M_ * D_)


def main():
    args = make_inputs(jnp.bfloat16)
    value, loc, att = args

    ref = jax.jit(lambda v, l, a: ms_deform_attn(v, SHAPES, l, a))(
        value, loc, att)
    for mode in ("slice", "scan", "barrier"):
        got = jax.jit(functools.partial(msda_v9, spatial_shapes=SHAPES,
                                        mode=mode))(value, loc=loc, att=att)
        err = float(jnp.abs(got.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        print(f"parity {mode:8s} max|d|={err:.3e}", flush=True)
        assert err < 1e-6, (mode, err)

    for name, fn in [
        ("v4 shipping", lambda v, l, a: ms_deform_attn(v, SHAPES, l, a)),
        ("v8 unrolled (r3 regression)",
         lambda v, l, a: msda_v8(v, SHAPES, l, a, groups=(8, 1, 1, 1))),
        ("v9 slice", lambda v, l, a: msda_v9(v, SHAPES, l, a, "slice")),
        ("v9 scan", lambda v, l, a: msda_v9(v, SHAPES, l, a, "scan")),
        ("v9 barrier", lambda v, l, a: msda_v9(v, SHAPES, l, a, "barrier")),
    ]:
        ms = honest_time(fn, args, perturb_value_loc)
        print(f"{name:32s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
