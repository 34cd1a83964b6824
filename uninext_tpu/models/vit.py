"""Plain ViT backbone with windowed attention (ViTDet-style), NHWC.

Capability parity: reference uninext/backbone/vit.py:233-432 (ViT/D2ViT):
patch embed 16x16, per-block window attention with a few global blocks,
2D-interpolated absolute position embeddings, simple multi-stride heads
(res3 = 2x deconv of the final map, res4 = 1x, res5 = maxpool /2).

TPU notes: window partitioning is pure reshape/transpose (no padding needed
when the bucketed input is divisible by patch*window); attention runs in
bf16 with fp32 softmax; relative-position biases use the decomposed ViTDet
form. This backbone is the natural TP candidate (heads/FFN sharding over the
'model' mesh axis) — hooks are in parallel/mesh.py.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_2d_sincos_pos_embed(dim: int, h: int, w: int) -> np.ndarray:
    """Standard 2D sin-cos embedding (backbone/pos_embed.py parity)."""
    gh = np.arange(h, dtype=np.float32)
    gw = np.arange(w, dtype=np.float32)
    gw, gh = np.meshgrid(gw, gh)

    def emb_1d(pos, d):
        omega = np.arange(d // 2, dtype=np.float32) / (d / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate([emb_1d(gh, dim // 2), emb_1d(gw, dim // 2)],
                          axis=1).reshape(h, w, dim)


class Attention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> same; full attention over the window with
        ViTDet decomposed relative position bias (backbone/utils.py parity)."""
        B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        if self.use_rel_pos:
            # decomposed rel-pos: bias[q,k] = q . (Rh[dy] + Rw[dx])
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * H - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * W - 1, hd))
            idx_h = (jnp.arange(H)[:, None] - jnp.arange(H)[None, :]) + H - 1
            idx_w = (jnp.arange(W)[:, None] - jnp.arange(W)[None, :]) + W - 1
            Rh = rel_h[idx_h].astype(self.dtype)       # (H, H, hd)
            Rw = rel_w[idx_w].astype(self.dtype)       # (W, W, hd)
            qg = q.reshape(B, H, W, self.num_heads, hd)
            bias_h = jnp.einsum("byxhd,yid->bhyxi", qg, Rh)  # (B,h,H,W,H)
            bias_w = jnp.einsum("byxhd,xjd->bhyxj", qg, Rw)  # (B,h,H,W,W)
            # ViTDet adds the bias computed from the UNSCALED q
            bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
                B, self.num_heads, H * W, H * W)
            attn = attn + bias
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int   # 0 = global
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)
        ws = self.window_size
        if ws > 0:
            ph = (ws - H % ws) % ws
            pw = (ws - W % ws) % ws
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
        x = Attention(self.dim, self.num_heads, dtype=self.dtype,
                      name="attn")(x)
        if ws > 0:
            x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            x = x[:, :H, :W]
        x = shortcut + x
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(y)
        return x + y


class ViT(nn.Module):
    """ViT-Huge default (reference D2ViT 'ViT-Huge')."""
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    window_size: int = 16
    global_blocks: Sequence[int] = (7, 15, 23, 31)
    in_channels: int = 3
    out_features: Sequence[str] = ("res3", "res4", "res5")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="patch_embed")(x)
        B, H, W, C = x.shape
        pos = jnp.asarray(get_2d_sincos_pos_embed(C, H, W), self.dtype)
        x = x + pos[None]
        for i in range(self.depth):
            ws = 0 if i in self.global_blocks else self.window_size
            x = ViTBlock(self.embed_dim, self.num_heads, ws,
                         dtype=self.dtype, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="norm")(x)

        outs = {}
        # simple multi-scale heads (ViTDet): res3 = 2x up, res4 = 1x, res5 = /2
        if "res3" in self.out_features:
            up = nn.ConvTranspose(self.embed_dim // 2, (2, 2), strides=(2, 2),
                                  dtype=self.dtype, name="up_res3")(x)
            outs["res3"] = up
        if "res4" in self.out_features:
            outs["res4"] = x
        if "res5" in self.out_features:
            outs["res5"] = nn.max_pool(x, (2, 2), strides=(2, 2))
        return outs
