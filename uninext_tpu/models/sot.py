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


def _interp_taps(coords: jnp.ndarray, size: jnp.ndarray):
    """F.interpolate(bilinear, align_corners=False) tap math over a length-
    `size` axis (size may be traced): torch clamps the SOURCE COORDINATE at
    the lower border (area_pixel_compute_source_index's max with 0 -> frac
    becomes 0 there), and tap indices at [0, size-1] — no zero padding at
    the resize stage."""
    coords = jnp.maximum(coords, 0.0)
    lo = jnp.floor(coords)
    frac = coords - lo
    size_i = size.astype(jnp.int32) if hasattr(size, "astype") else size
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, size_i - 1)
    hi_i = jnp.clip(lo_i + 1, 0, size_i - 1)
    return lo_i, hi_i, frac


def crop_template(images: jnp.ndarray, boxes_xyxy: jnp.ndarray,
                  template_size: int = 256,
                  search_area_factor: float = 2.0,
                  gt_masks: Optional[jnp.ndarray] = None,
                  mask_channel: bool = False,
                  pad_masks: Optional[jnp.ndarray] = None):
    """Reference-exact template crop (ddetrs_vid_dn.py get_template :66-93 /
    get_template_4c :95-139).

    Semantics mirrored exactly:
      * integer crop window: crop_sz = ceil(sqrt(w*h)*factor),
        x1 = round(cx - crop_sz/2); window [x1, x1+crop_sz) zero-padded,
        with the reference's boundary quirk that content stops at
        min(x2, W-1) (its pad amount is computed as x2 - (W-1)).
      * the padded crop is resized to template_size^2 with
        F.interpolate(bilinear, align_corners=False): taps CLAMP at the crop
        border (replicate), zeros only come from the pad INSIDE the window.
      * pad-mask channel: the image pad mask is cropped the same way with
        pad value 1, bilinear-resized, then thresholded (torch .bool():
        nonzero -> True).
      * optional 4th channel (VOS / extra template backbone): the gt mask
        cropped with zero pad, or — when no gt mask exists — the target-box
        region of the crop set to 1 before the resize.

    images: (B, H, W, 3); boxes_xyxy: (B, 4) input pixels; gt_masks:
    optional (B, H, W) in {0,1}; pad_masks: optional (B, H, W) True=pad.
    Returns (crop (B, t, t, 3+mask_channel), pad (B, t, t) bool)."""
    B, H, W, _ = images.shape
    t = template_size

    def one(img, box, gmask, pmask):
        x0, y0, x1b, y1b = box
        w = x1b - x0
        h = y1b - y0
        # clamp: a degenerate (zero-area) box must not produce crop_sz=0,
        # whose -1 tap indices would silently wrap and sample garbage
        crop_sz = jnp.maximum(jnp.ceil(jnp.sqrt(w * h) * search_area_factor),
                              1.0)
        xa = jnp.round(x0 + 0.5 * w - crop_sz * 0.5)
        ya = jnp.round(y0 + 0.5 * h - crop_sz * 0.5)
        xb = xa + crop_sz
        yb = ya + crop_sz

        # resize grid in crop space, then taps clamped to the crop window
        u = (jnp.arange(t, dtype=jnp.float32) + 0.5) * (crop_sz / t) - 0.5
        cy0, cy1, fy = _interp_taps(u, crop_sz)
        cx0, cx1, fx = _interp_taps(u, crop_sz)

        # gather helper: (t,) y-taps x (t,) x-taps -> (t, t, C)
        def sample(chan, fill):
            """chan: (H, W, C); fill: pad value inside the window but outside
            the image content range."""
            def at(cy, cx):
                sy = ya.astype(jnp.int32) + cy
                sx = xa.astype(jnp.int32) + cx
                vy = (sy >= 0) & (sy < jnp.minimum(yb.astype(jnp.int32),
                                                   H - 1))
                vx = (sx >= 0) & (sx < jnp.minimum(xb.astype(jnp.int32),
                                                   W - 1))
                v = chan[jnp.clip(sy, 0, H - 1)[:, None],
                         jnp.clip(sx, 0, W - 1)[None, :]]
                ok = (vy[:, None] & vx[None, :])[..., None]
                return jnp.where(ok, v, fill)

            fyc = fy[:, None, None]
            fxc = fx[None, :, None]
            return ((1 - fyc) * (1 - fxc) * at(cy0, cx0)
                    + (1 - fyc) * fxc * at(cy0, cx1)
                    + fyc * (1 - fxc) * at(cy1, cx0)
                    + fyc * fxc * at(cy1, cx1))

        crop = sample(img, 0.0)
        pm = (pmask if pmask is not None
              else jnp.zeros((H, W), jnp.float32))[..., None]
        pad = sample(pm.astype(jnp.float32), 1.0)[..., 0] > 0

        if mask_channel:
            if gmask is not None:
                mc = sample(gmask.astype(jnp.float32)[..., None], 0.0)
            else:
                # box region (crop space) set to 1 before the resize:
                # x1_t = round(x - xa) .. x2_t = round(x1_t + w)
                x1_t = jnp.round(x0 - xa)
                x2_t = x1_t + jnp.round(w)
                y1_t = jnp.round(y0 - ya)
                y2_t = y1_t + jnp.round(h)

                def boxat(cy, cx):
                    inside = (((cy >= y1_t) & (cy < y2_t))[:, None]
                              & ((cx >= x1_t) & (cx < x2_t))[None, :])
                    return inside.astype(jnp.float32)[..., None]

                fyc = fy[:, None, None]
                fxc = fx[None, :, None]
                mc = ((1 - fyc) * (1 - fxc) * boxat(cy0, cx0)
                      + (1 - fyc) * fxc * boxat(cy0, cx1)
                      + fyc * (1 - fxc) * boxat(cy1, cx0)
                      + fyc * fxc * boxat(cy1, cx1))
            crop = jnp.concatenate([crop, mc.astype(crop.dtype)], -1)
        return crop, pad

    boxes = boxes_xyxy.astype(jnp.float32)
    if gt_masks is None and pad_masks is None:
        out = jax.vmap(lambda i, b: one(i, b, None, None))(images, boxes)
    elif gt_masks is None:
        out = jax.vmap(lambda i, b, p: one(i, b, None, p))(
            images, boxes, pad_masks)
    elif pad_masks is None:
        out = jax.vmap(lambda i, b, g: one(i, b, g, None))(
            images, boxes, gt_masks)
    else:
        out = jax.vmap(one)(images, boxes, gt_masks, pad_masks)
    return out


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
    """(B, H, W, C) -> (B, out, out, C) NEAREST — torch F.interpolate's
    default mode, which the reference uses for the per-level template resize
    (ddetrs_vid_dn.py:536: F.interpolate(srcs_ref[n_l], size=(8, 8)));
    src index = floor(i * in / out)."""
    B, H, W, C = x.shape
    iy = (jnp.arange(out) * H) // out
    ix = (jnp.arange(out) * W) // out
    return x[:, iy][:, :, ix]
