"""CondInst dynamic-conv mask head, TPU-native.

Parity anchors (reference models/ddetrs.py):
  * MaskHeadSmallConv       — :670-778 (FPN-style decode of encoder memory
                              levels s32->s16->s8, then dim/4 -> dim/32=8)
  * parse_dynamic_params    — :895-918 (controller output -> per-instance
                              1x1-conv weights: (10*8, 8*8, 8*1) + biases)
  * mask_heads_forward      — :488-506 (grouped 1x1 convs == batched einsum)
  * dynamic_mask_with_coords— :509-598 (rel-coords in *absolute pixels*)
  * aligned_bilinear        — :921-943
  * compute_locations       — :946-959

TPU re-design: grouped 1x1 convolutions over N instances become a batched
einsum (B, N, HW, Cin) x (B, N, Cin, Cout) on the MXU — no group-conv
emulation. Instances are padded to a static `max_insts` and masked in the
loss. `aligned_bilinear` (align_corners=True + replicate pads) is expressed
as two separable interpolation matmuls, which XLA maps onto the MXU instead
of a gather.
"""
from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..config import MaskHeadConfig, TransformerConfig


def dynamic_params_split(cfg: MaskHeadConfig, rel_coord: bool, in_channels: int):
    """Per-layer (weight, bias) sizes of the controller output.

    in_channels: mask-feature channels = d_model // 32 (ddetrs.py:45)."""
    ch = cfg.dynamic_mask_channels
    in_ch = in_channels + (2 if rel_coord else 0)
    weight_nums, bias_nums = [], []
    for l in range(cfg.controller_layers):
        if l == 0:
            weight_nums.append(in_ch * ch)
            bias_nums.append(ch)
        elif l == cfg.controller_layers - 1:
            weight_nums.append(ch * 1)
            bias_nums.append(1)
        else:
            weight_nums.append(ch * ch)
            bias_nums.append(ch)
    return weight_nums, bias_nums


def num_gen_params(cfg: MaskHeadConfig, in_channels: int) -> int:
    w, b = dynamic_params_split(cfg, cfg.rel_coord, in_channels)
    return sum(w) + sum(b)


def _aligned_bilinear_matrix(in_size: int, factor: int) -> np.ndarray:
    """Composite 1D interpolation matrix of the reference's aligned_bilinear.

    The reference (ddetrs.py:921-943) does: replicate-pad right by 1 ->
    align_corners=True resize to factor*h+1 (src coord = i/factor) ->
    replicate-pad left by factor//2 -> crop to factor*h. Folding all steps
    into one (factor*h, h) matrix turns the op into an MXU matmul.
    """
    h, p = in_size, factor // 2
    M = np.zeros((factor * h, h), dtype=np.float32)
    for j in range(factor * h):
        i = max(j - p, 0)                 # left replicate pad then crop
        c = i / factor                    # align_corners=True on padded grid
        lo = int(np.floor(c))
        frac = c - lo
        hi = lo + 1
        M[j, min(lo, h - 1)] += 1 - frac  # right replicate pad: clamp to h-1
        M[j, min(hi, h - 1)] += frac
    return M


def aligned_bilinear(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """x: (..., H, W) -> (..., H*factor, W*factor), CondInst convention."""
    if factor == 1:
        return x
    H, W = x.shape[-2], x.shape[-1]
    My = jnp.asarray(_aligned_bilinear_matrix(H, factor), dtype=x.dtype)
    Mx = jnp.asarray(_aligned_bilinear_matrix(W, factor), dtype=x.dtype)
    return jnp.einsum("oh,...hw,pw->...op", My, x, Mx)


class MaskHeadSmallConv(nn.Module):
    """Decode encoder memory (levels s8, s16, s32) into 8-ch mask features."""
    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """feats: [(B,H8,W8,C), (B,H16,W16,C), (B,H32,W32,C)] -> (B,H8,W8,8)."""
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=1, dtype=self.dtype,
                                       kernel_init=nn.initializers.he_uniform(),
                                       name=name)

        def up_nearest(x, target_hw):
            H, W = x.shape[1], x.shape[2]
            th, tw = target_hw
            x = jnp.repeat(x, th // H if th % H == 0 else 1, axis=1)
            x = jnp.repeat(x, tw // W if tw % W == 0 else 1, axis=2)
            if x.shape[1] != th or x.shape[2] != tw:
                # odd sizes: nearest via index gather
                iy = (jnp.arange(th) * H // th)
                ix = (jnp.arange(tw) * W // tw)
                x = x[:, iy][:, :, ix]
            return x

        x = nn.relu(conv(self.dim, "lay3")(feats[-1]))
        x = feats[-2] + up_nearest(x, feats[-2].shape[1:3])
        x = nn.relu(conv(self.dim, "lay4")(x))
        x = feats[-3] + up_nearest(x, feats[-3].shape[1:3])
        x = nn.relu(conv(self.dim, "jia_dcn")(x))
        x = nn.relu(conv(self.dim // 4, "lay1")(x))
        x = nn.relu(conv(self.dim // 32, "lay2")(x))
        return x


def dynamic_mask_forward(mask_feats: jnp.ndarray,
                         reference_points: jnp.ndarray,
                         params: jnp.ndarray,
                         cfg: MaskHeadConfig,
                         mask_feat_stride: int = 8) -> jnp.ndarray:
    """Run per-instance dynamic 1x1 convs over mask features.

    mask_feats:       (B, H, W, 8)  stride-8 features
    reference_points: (B, N, 2)     instance centers in *input-image pixels*
    params:           (B, N, num_gen_params) controller outputs
    Returns mask logits (B, N, H*up, W*up) at stride mask_out_stride.
    """
    B, H, W, C = mask_feats.shape
    N = params.shape[1]
    ch = cfg.dynamic_mask_channels
    weight_nums, bias_nums = dynamic_params_split(cfg, cfg.rel_coord, C)

    if cfg.rel_coord:
        ys = jnp.arange(H, dtype=jnp.float32) * mask_feat_stride + mask_feat_stride // 2
        xs = jnp.arange(W, dtype=jnp.float32) * mask_feat_stride + mask_feat_stride // 2
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        locations = jnp.stack([gx, gy], -1).reshape(1, 1, H * W, 2)
        rel = (reference_points[:, :, None, :] - locations)       # (B,N,HW,2)
        feats = jnp.tile(mask_feats.reshape(B, 1, H * W, C), (1, N, 1, 1))
        x = jnp.concatenate([rel, feats], -1)                     # (B,N,HW,C+2)
    else:
        x = jnp.tile(mask_feats.reshape(B, 1, H * W, C), (1, N, 1, 1))

    # split controller outputs into per-layer weights/biases
    sizes = weight_nums + bias_nums
    splits = jnp.split(params, np.cumsum(sizes)[:-1].tolist(), axis=-1)
    ws, bs = splits[:len(weight_nums)], splits[len(weight_nums):]

    n_layers = len(weight_nums)
    for l in range(n_layers):
        cin = x.shape[-1]
        cout = 1 if l == n_layers - 1 else ch
        # torch conv weight layout (out, in); params are (N, out*in)
        w = ws[l].reshape(B, N, cout, cin)
        b = bs[l].reshape(B, N, 1, cout)
        x = jnp.einsum("bnsc,bnoc->bnso", x, w) + b
        if l < n_layers - 1:
            x = nn.relu(x)

    logits = x.reshape(B, N, H, W)
    up = mask_feat_stride // cfg.mask_out_stride
    return aligned_bilinear(logits, up)
