"""Multi-scale deformable attention — the single hot op of the framework.

Semantics match the reference CUDA kernel `ms_deformable_im2col_gpu_kernel`
(ops/src/cuda/ms_deform_im2col_cuda.cuh:238) and its pure-torch ground truth
`ms_deform_attn_core_pytorch` (ops/functions/ms_deform_attn_func.py:43-63):
for every (query, head, level, point), bilinearly sample the flattened
multi-level value map at `sampling_locations` (normalized to [0,1] per level,
grid_sample align_corners=False / zero padding convention) and reduce with
`attention_weights`.

TPU-first design decisions:
  * `spatial_shapes` is a STATIC python tuple of (H, W) ints. Image sizes are
    bucketed by the data pipeline, so each bucket compiles once. This removes
    every dynamic shape from the op and lets XLA constant-fold all level
    arithmetic (level_start_index never exists at runtime).
  * The gather is expressed as one `take_along_axis` per level over the
    (B*M, H*W, D) value slab with the feature dim D innermost and contiguous
    (D=32 floats = aligned VMEM rows), which XLA lowers to TPU's native
    dynamic-gather. Bilinear corner weights are folded into a single fused
    multiply-reduce with the attention weights.
  * Autodiff: plain JAX AD through the gathers (scatter-add backward), same
    numerics as the reference col2im backward.

Layouts:
  value:              (B, S, M, D)    S = sum(H_l * W_l)
  sampling_locations: (B, Lq, M, L, P, 2)  in [0, 1], (x, y) order
  attention_weights:  (B, Lq, M, L, P)     softmax-normalized over (L, P)
  returns:            (B, Lq, M * D)
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _sample_level(value_l: jnp.ndarray, loc: jnp.ndarray, attn: jnp.ndarray,
                  H: int, W: int) -> jnp.ndarray:
    """Bilinear-sample one level and apply attention weights.

    value_l: (B, M, H*W, D) one level's value slab
    loc:     (B, Lq, M, P, 2) normalized sampling locations for this level
    attn:    (B, Lq, M, P) attention weights for this level
    returns: (B, Lq, M, D) weighted sample sum over P
    """
    B, Lq, M, P, _ = loc.shape
    D = value_l.shape[-1]
    compute_dtype = value_l.dtype

    # grid_sample(align_corners=False) pixel-space coords: x = loc_x * W - 0.5
    x = loc[..., 0] * W - 0.5
    y = loc[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(compute_dtype)
    fy = (y - y0).astype(compute_dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # validity per corner (zero padding outside)
    def corner(ix, iy):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        flat = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        return flat, valid.astype(compute_dtype)

    i00, v00 = corner(x0i, y0i)
    i01, v01 = corner(x0i + 1, y0i)
    i10, v10 = corner(x0i, y0i + 1)
    i11, v11 = corner(x0i + 1, y0i + 1)

    # bilinear corner weights folded with attention weights -> one gather +
    # one fused multiply-add chain, everything elementwise on the VPU
    attn = attn.astype(compute_dtype)
    w00 = (1 - fx) * (1 - fy) * v00 * attn
    w01 = fx * (1 - fy) * v01 * attn
    w10 = (1 - fx) * fy * v10 * attn
    w11 = fx * fy * v11 * attn

    # gather: indices (B, M, Lq*P) into slab (B, M, HW, D)
    def gather(idx):
        idx = jnp.transpose(idx, (0, 2, 1, 3)).reshape(B, M, Lq * P)
        g = jnp.take_along_axis(value_l, idx[..., None], axis=2)
        return g.reshape(B, M, Lq, P, D)

    out = (gather(i00) * jnp.transpose(w00, (0, 2, 1, 3))[..., None]
           + gather(i01) * jnp.transpose(w01, (0, 2, 1, 3))[..., None]
           + gather(i10) * jnp.transpose(w10, (0, 2, 1, 3))[..., None]
           + gather(i11) * jnp.transpose(w11, (0, 2, 1, 3))[..., None])
    # (B, M, Lq, P, D) -> (B, Lq, M, D)
    return jnp.transpose(out.sum(axis=3), (0, 2, 1, 3))


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Fused multi-level bilinear gather + attention-weighted reduction.

    Args:
      value: (B, S, M, D) with S == sum(H*W over levels).
      spatial_shapes: static tuple of (H, W) per level.
      sampling_locations: (B, Lq, M, L, P, 2), normalized (x, y) in [0, 1].
      attention_weights: (B, Lq, M, L, P).
    Returns:
      (B, Lq, M * D)
    """
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)
    assert S == sum(h * w for h, w in spatial_shapes), (
        f"value length {S} != sum of spatial shapes "
        f"{sum(h * w for h, w in spatial_shapes)}")

    # (B, S, M, D) -> (B, M, S, D): put heads outside the gathered axis once
    value_t = jnp.transpose(value, (0, 2, 1, 3))

    out = jnp.zeros((B, Lq, M, D), dtype=value.dtype)
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        value_l = jax.lax.slice_in_dim(value_t, start, start + H * W, axis=2)
        out = out + _sample_level(
            value_l,
            sampling_locations[:, :, :, lvl],
            attention_weights[:, :, :, lvl],
            H, W)
        start += H * W
    return out.reshape(B, Lq, M * D)
