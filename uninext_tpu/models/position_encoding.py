"""Sine positional embedding over padded feature maps.

Parity: reference `models/deformable_detr/position_encoding.py:20`
(PositionEmbeddingSine, num_pos_feats=128, temperature=10000, normalize=True,
scale=2*pi) — cumulative-sum over the validity mask so embeddings are
normalized to the *valid* region of each padded image.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def position_embedding_sine(mask: jnp.ndarray, num_pos_feats: int = 128,
                            temperature: int = 10000,
                            dtype=jnp.float32) -> jnp.ndarray:
    """mask: (B, H, W) bool, True = PADDING. Returns (B, H, W, 2*num_pos_feats)."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    scale = 2 * math.pi
    # the reference shifts by -0.5 before normalizing (pixel centers;
    # position_encoding.py:46-48)
    y_embed = (y_embed - 0.5) / (y_embed[:, -1:, :] + eps) * scale
    x_embed = (x_embed - 0.5) / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def get_proposal_pos_embed(proposals: jnp.ndarray, num_pos_feats: int = 128,
                           temperature: int = 10000) -> jnp.ndarray:
    """Sine embedding of (sigmoided) proposal boxes for two-stage query init.

    proposals: (..., 4) logits. Returns (..., 4*num_pos_feats).
    Parity: reference deformable_transformer.py:118-131.
    """
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    # sigmoid first so +/-inf coords (masked invalid proposals) map to 1/0
    pos = jax.nn.sigmoid(jnp.asarray(proposals)) * scale
    pos = pos[..., None] / dim_t           # (..., 4, num_pos_feats)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)                # (..., 4, num_pos_feats/2, 2)
    return pos.reshape(*pos.shape[:-3], -1)
