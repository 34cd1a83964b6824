"""Shared model layers: MLP, FeatureResizer, MSDeformAttn module, MHA.

Parity anchors:
  * MLP             — reference deformable_detr.py:917-929
  * FeatureResizer  — deformable_transformer.py:510-529 (768 -> 256 + LN)
  * MSDeformAttn    — ops/modules/ms_deform_attn.py:30-116 (projections,
                      softmax over (levels x points), reference-point offset
                      normalization, directional bias init)
  * MultiHeadAttention — decoder self-attention (torch nn.MultiheadAttention)
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.msda import ms_deform_attn


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32
    # optional override for the last layer's kernel/bias init (bbox head zeros)
    final_kernel_init: Any = None
    final_bias_init: Any = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            feats = self.output_dim if last else self.hidden_dim
            kinit = (self.final_kernel_init if last and self.final_kernel_init
                     else nn.initializers.lecun_normal())
            binit = (self.final_bias_init if last and self.final_bias_init
                     else nn.initializers.zeros)
            x = nn.Dense(feats, dtype=self.dtype, kernel_init=kinit,
                         bias_init=binit, name=f"layer_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class FeatureResizer(nn.Module):
    output_dim: int
    do_ln: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        if self.do_ln:
            x = nn.LayerNorm(epsilon=1e-12, name="ln")(x)
        return x


def _sampling_offsets_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Directional ring init for sampling offsets (ms_deform_attn.py:62-70)."""
    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)       # (H, 2)
        grid = grid / jnp.abs(grid).max(-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        scales = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
        return (grid * scales).reshape(-1).astype(dtype)
    return init


class MSDeformAttnModule(nn.Module):
    """Projections around the fused sampling op.

    __call__(query (B,Lq,C), reference_points (B,Lq,L,2|4),
             value_flatten (B,S,C), value_mask (B,S) True=padding,
             spatial_shapes static)
    """
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, value_flatten, value_mask,
                 spatial_shapes: Sequence[Tuple[int, int]]):
        B, Lq, _ = query.shape
        S = value_flatten.shape[1]
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = self.d_model // M

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(value_flatten)
        if value_mask is not None:
            value = jnp.where(value_mask[..., None], 0.0, value)
        value = value.reshape(B, S, M, D)
        # Under sequence parallelism (sp_encoder) the token axis is sharded
        # over "model"; every query may sample anywhere, so the gather TABLE
        # must be whole on each chip. Pin it replicated-over-model here — one
        # clean all-gather — or XLA's SPMD partitioner lowers the per-level
        # gathers into a pathological resharding loop.
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and "model" in mesh.axis_names \
                and mesh.shape.get("model", 1) > 1:
            from jax.sharding import PartitionSpec as _P
            value = jax.lax.with_sharding_constraint(
                value, _P("data", None, None, None))

        offsets = nn.Dense(
            M * L * P * 2, dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=_sampling_offsets_bias_init(M, L, P),
            name="sampling_offsets")(query.astype(jnp.float32))
        offsets = offsets.reshape(B, Lq, M, L, P, 2)

        attn = nn.Dense(M * L * P, dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        name="attention_weights")(query.astype(jnp.float32))
        attn = nn.softmax(attn.reshape(B, Lq, M, L * P), axis=-1).reshape(B, Lq, M, L, P)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.array([[w, h] for h, w in spatial_shapes],
                                   dtype=jnp.float32)                    # (L, 2)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / normalizer[None, None, None, :, None, :])
        else:
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5)

        out = ms_deform_attn(value, tuple(spatial_shapes),
                             loc.astype(value.dtype), attn.astype(value.dtype))
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)


class MultiHeadAttention(nn.Module):
    """Standard MHA for decoder self-attention; supports an additive/bool
    attention mask of shape (Lq, Lk) or (B, Lq, Lk) where True = blocked."""
    d_model: int
    n_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jnp.ndarray] = None):
        H = self.n_heads
        Dh = self.d_model // H
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype, name=name)
        qh = dense("q_proj")(q).reshape(B, Lq, H, Dh)
        kh = dense("k_proj")(k).reshape(B, Lk, H, Dh)
        vh = dense("v_proj")(v).reshape(B, Lk, H, Dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(Dh)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                attn_mask = attn_mask[None, None]
            else:
                attn_mask = attn_mask[:, None]
            scores = jnp.where(attn_mask, -1e9, scores)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, Lq, self.d_model)
        return dense("out_proj")(out)


def get_sine_pos_embed(pos: jnp.ndarray, num_pos_feats: int = 128,
                       temperature: int = 10000,
                       exchange_xy: bool = True) -> jnp.ndarray:
    """Sine embedding of box coords for DAB/DINO query pos.

    pos: (B, N, n) in [0,1]. Returns (B, N, n*num_pos_feats).
    Parity: deformable_transformer_dino.py:612-646 get_sine_pos_embed.
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def sine(x):  # x: (B, N, 1)
        sx = x * scale / dim_t
        return jnp.stack([jnp.sin(sx[:, :, 0::2]), jnp.cos(sx[:, :, 1::2])],
                         axis=3).reshape(*x.shape[:2], -1)

    parts = [sine(pos[..., i:i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=2)
