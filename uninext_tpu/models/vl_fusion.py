"""Bidirectional vision-language early fusion (GLIP-style).

Parity targets:
  * BiMultiHeadAttention  — reference fuse_helper.py:7-139 (stability clamps
    at +/-50000, text-side max-subtraction, language-mask on the v->l softmax)
  * BiAttentionBlock      — fuse_helper.py:142-179 (pre-LN, layer-scale gammas
    init 1/enc_layers)
  * VLFuse                — vlfusion.py:64-120

TPU notes: one einsum produces the (img, text) similarity once; both softmax
directions reuse it. Softmaxes run in fp32 regardless of compute dtype.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..config import TransformerConfig, LanguageConfig


class BiMultiHeadAttention(nn.Module):
    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, v, l, l_mask):
        """v: (B, Nv, v_dim); l: (B, Nl, l_dim); l_mask: (B, Nl) 1=valid."""
        H = self.num_heads
        Dh = self.embed_dim // H
        scale = Dh ** -0.5
        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, name=name)
        B, Nv, _ = v.shape
        Nl = l.shape[1]

        q = (dense(self.embed_dim, "v_proj")(v) * scale).reshape(B, Nv, H, Dh)
        k = dense(self.embed_dim, "l_proj")(l).reshape(B, Nl, H, Dh)
        val_v = dense(self.embed_dim, "values_v_proj")(v).reshape(B, Nv, H, Dh)
        val_l = dense(self.embed_dim, "values_l_proj")(l).reshape(B, Nl, H, Dh)

        attn = jnp.einsum("bvhd,blhd->bhvl", q, k)
        attn = jnp.clip(attn, -50000, 50000)

        # text->vision direction: softmax over image tokens, with the
        # reference's per-row max subtraction
        attn_t = jnp.swapaxes(attn, 2, 3)                      # (B, H, l, v)
        attn_t = attn_t - attn_t.max(axis=-1, keepdims=True)
        attn_t = jnp.clip(attn_t, -50000, 50000)
        probs_l = nn.softmax(attn_t.astype(jnp.float32), axis=-1).astype(self.dtype)

        # vision->text direction: mask invalid text tokens
        if l_mask is not None:
            bias = jnp.where(l_mask[:, None, None, :] > 0, 0.0, -9e15)
            attn = attn + bias.astype(attn.dtype)
        probs_v = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)

        out_v = jnp.einsum("bhvl,blhd->bvhd", probs_v, val_l).reshape(B, Nv, self.embed_dim)
        out_l = jnp.einsum("bhlv,bvhd->blhd", probs_l, val_v).reshape(B, Nl, self.embed_dim)
        return (dense(self.v_dim, "out_v_proj")(out_v),
                dense(self.l_dim, "out_l_proj")(out_l))


class VLFuse(nn.Module):
    """Pre-LN bi-attention block with layer-scale residuals."""
    tcfg: TransformerConfig
    lcfg: LanguageConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, visual, lang_hidden, lang_mask):
        v_dim = self.tcfg.d_model
        l_dim = self.lcfg.hidden_dim
        init_values = 1.0 / self.tcfg.enc_layers
        v = nn.LayerNorm(name="layer_norm_v")(visual)
        l = nn.LayerNorm(name="layer_norm_l")(lang_hidden)
        dv, dl = BiMultiHeadAttention(
            v_dim=v_dim, l_dim=l_dim, embed_dim=self.tcfg.vl_hidden_dim,
            num_heads=8, dtype=self.dtype, name="attn")(v, l, lang_mask)
        gamma_v = self.param("gamma_v",
                             nn.initializers.constant(init_values), (v_dim,))
        gamma_l = self.param("gamma_l",
                             nn.initializers.constant(init_values), (l_dim,))
        # the reference's residual base is the NORMED features, not the
        # block input: v = LN(v); v = v + gamma*delta (fuse_helper.py:173-178)
        return v + gamma_v * dv, l + gamma_l * dl
