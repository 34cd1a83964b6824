"""SOT/VOS template machinery: annotation prompts as pseudo-language tokens.

Parity anchors (reference models/ddetrs_vid.py):
  * get_template      — :46-74 (square crop of side sqrt(w*h)*factor around
                        the target box, resized to template_size^2)
  * get_template_4c   — :75 (RGB + mask 4th channel for VOS)
  * coco_forward_sot  — :197-253 (template branch backbone -> per-level
                        resize to ref_feat_size^2 -> concat tokens ->
                        adjust_layer 256 -> 768 => pseudo-language features)
  * FeatureFuser      — :757 (optional P3-P6 fusion, SOT.FEAT_FUSE)

TPU design: the crop is a batched bilinear gather over a fixed
(template_size x template_size) grid — fully jittable, no host roundtrip.
The per-level 8x8 resize is an average-pool-like bilinear resize expressed as
two interpolation matmuls.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
                    ) -> jnp.ndarray:
    """img: (H, W, C); ys/xs: (h, w) pixel coords. Zero padding outside."""
    H, W, C = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def at(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[..., None]
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid, v, 0.0)

    return ((1 - fy) * (1 - fx) * at(y0i, x0i)
            + (1 - fy) * fx * at(y0i, x0i + 1)
            + fy * (1 - fx) * at(y0i + 1, x0i)
            + fy * fx * at(y0i + 1, x0i + 1))


def crop_template(images: jnp.ndarray, boxes_xyxy: jnp.ndarray,
                  template_size: int = 256,
                  search_area_factor: float = 2.0) -> jnp.ndarray:
    """images: (B, H, W, C); boxes_xyxy: (B, 4) in input pixels.
    Returns (B, template_size, template_size, C) crops."""
    def one(img, box):
        x0, y0, x1, y1 = box
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        w = jnp.maximum(x1 - x0, 1.0)
        h = jnp.maximum(y1 - y0, 1.0)
        s = jnp.sqrt(w * h) * search_area_factor
        t = template_size
        # pixel centers of the resized crop mapped back to source coords
        u = (jnp.arange(t, dtype=jnp.float32) + 0.5) / t - 0.5
        ys = cy + u * s - 0.5
        xs = cx + u * s - 0.5
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return bilinear_sample(img, gy, gx)

    return jax.vmap(one)(images, boxes_xyxy.astype(jnp.float32))


class FeatureFuser(nn.Module):
    """SOT multi-level template fusion (reference ddetrs_vid.py:757-783):
    3x3 conv per level, aligned-bilinear upsample to the finest level, sum."""
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels):
        from .mask_head import aligned_bilinear
        out = None
        H0, W0 = levels[0].shape[1:3]
        for i, f in enumerate(levels):
            x = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"refine_{i}")(f)
            if x.shape[1] != H0:
                factor = H0 // x.shape[1]
                x = jnp.moveaxis(
                    aligned_bilinear(jnp.moveaxis(x, -1, 1), factor), 1, -1)
            out = x if out is None else out + x
        return out


def resize_level(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, out, out, C) bilinear (half-pixel centers) via two
    interpolation matmuls (MXU-friendly)."""
    B, H, W, C = x.shape

    def matrix(in_size):
        coords = (jnp.arange(out) + 0.5) * in_size / out - 0.5
        lo = jnp.floor(coords)
        frac = coords - lo
        lo_i = jnp.clip(lo.astype(jnp.int32), 0, in_size - 1)
        hi_i = jnp.clip(lo_i + 1, 0, in_size - 1)
        M = (jnp.zeros((out, in_size))
             .at[jnp.arange(out), lo_i].add(1 - frac)
             .at[jnp.arange(out), hi_i].add(frac))
        return M

    My = matrix(H).astype(x.dtype)
    Mx = matrix(W).astype(x.dtype)
    return jnp.einsum("oh,bhwc,pw->bopc", My, x, Mx)
