"""BoxInst host-side preprocessing: LAB color similarity + box bitmasks.

Parity: UNINEXT_IMG.prepare_image_targets_boxinst + get_images_color_similarity
(uninext_img.py — similarity = exp(-||LAB diff||2 * 0.5) over the 8 dilated
neighbors, masked by image validity; bottom BOTTOM_PIXELS_REMOVED rows
cleared as in the reference's BDD handling).
"""
from __future__ import annotations

import numpy as np


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """rgb uint8/float (H, W, 3) in [0,255] -> CIELAB float (H, W, 3)."""
    rgb = np.asarray(rgb, np.float64) / 255.0
    mask = rgb > 0.04045
    rgb = np.where(mask, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    M = np.array([[0.412453, 0.357580, 0.180423],
                  [0.212671, 0.715160, 0.072169],
                  [0.019334, 0.119193, 0.950227]])
    xyz = rgb @ M.T
    xyz /= np.array([0.95047, 1.0, 1.08883])
    f = np.where(xyz > 0.008856, np.cbrt(xyz), 7.787 * xyz + 16.0 / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], -1).astype(np.float32)


def _unfold_wo_center_np(x: np.ndarray, k: int = 3, d: int = 2) -> np.ndarray:
    """x: (C, H, W) -> (C, 8, H, W) zero-padded dilated neighbors."""
    pad = (k + (d - 1) * (k - 1)) // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    H, W = x.shape[-2:]
    outs = []
    for dy in range(k):
        for dx in range(k):
            if dy == k // 2 and dx == k // 2:
                continue
            outs.append(xp[:, dy * d:dy * d + H, dx * d:dx * d + W])
    return np.stack(outs, axis=1)


def color_similarity(image_rgb: np.ndarray, valid_mask: np.ndarray,
                     stride: int = 4, kernel_size: int = 3,
                     dilation: int = 2) -> np.ndarray:
    """image_rgb (H, W, 3) [0,255]; valid_mask (H, W) 1=image, 0=padding.
    Returns (8, H//stride, W//stride) neighbor similarities at mask stride."""
    lab = rgb_to_lab(image_rgb)
    s = stride
    lab_s = lab[s // 2::s, s // 2::s].transpose(2, 0, 1)      # (3, h, w)
    m_s = valid_mask[s // 2::s, s // 2::s].astype(np.float32)
    un = _unfold_wo_center_np(lab_s, kernel_size, dilation)   # (3, 8, h, w)
    diff = lab_s[:, None] - un
    sim = np.exp(-np.linalg.norm(diff, axis=0) * 0.5)         # (8, h, w)
    un_m = _unfold_wo_center_np(m_s[None], kernel_size, dilation)[0]
    return (sim * un_m).astype(np.float32)


def boxes_to_bitmasks(boxes_cxcywh: np.ndarray, valid: np.ndarray,
                      h: int, w: int, stride: int = 4,
                      bottom_pixels_removed: int = 0) -> np.ndarray:
    """(G, 4) normalized cxcywh -> (G, h/stride... ) box rasterizations at
    the mask stride (already divided grid h, w given)."""
    G = len(boxes_cxcywh)
    out = np.zeros((G, h, w), np.float32)
    ys = (np.arange(h) * stride + stride // 2)
    xs = (np.arange(w) * stride + stride // 2)
    H, W = h * stride, w * stride
    for g in range(G):
        if not valid[g]:
            continue
        cx, cy, bw, bh = boxes_cxcywh[g]
        x0, x1 = (cx - bw / 2) * W, (cx + bw / 2) * W
        y0, y1 = (cy - bh / 2) * H, (cy + bh / 2) * H
        if bottom_pixels_removed > 0:
            y1 = min(y1, H - bottom_pixels_removed)
        out[g] = ((ys[:, None] >= y0) & (ys[:, None] <= y1)
                  & (xs[None, :] >= x0) & (xs[None, :] <= x1))
    return out
