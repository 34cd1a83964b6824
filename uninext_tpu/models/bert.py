"""BERT text encoder in Flax (bert-base-uncased architecture).

Capability parity: reference `models/deformable_detr/bert_model.py:10`
(BertEncoder wrapping HF BertModel; returns the last hidden layer + mask) and
the vendored clamped `modeling_bert.py` used inside the VL fusion. We
implement the standard post-LN BERT encoder directly; weights from HF torch
checkpoints map 1:1 via the converter (uninext_tpu/engine/convert.py).

PARALLEL_DET support: a (B, L, L) additive attention-mask lets the caller pass
a block-diagonal mask so independent class-name prompts don't attend to each
other (reference bert_model.py:32-74).
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import LanguageConfig


class BertSelfAttention(nn.Module):
    cfg: LanguageConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        head_dim = c.hidden_dim // c.num_heads
        dense = lambda name: nn.Dense(c.hidden_dim, dtype=self.dtype, name=name)
        q = dense("query")(x).reshape(*x.shape[:-1], c.num_heads, head_dim)
        k = dense("key")(x).reshape(*x.shape[:-1], c.num_heads, head_dim)
        v = dense("value")(x).reshape(*x.shape[:-1], c.num_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(self.dtype)
        # bf16-stability clamps, parity with the vendored modeling_bert.py
        scores = jnp.clip(scores + attn_bias, -50000, 50000)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape)
        out = nn.Dense(c.hidden_dim, dtype=self.dtype, name="output")(out)
        return out


class BertLayer(nn.Module):
    cfg: LanguageConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        c = self.cfg
        attn = BertSelfAttention(c, dtype=self.dtype, name="attention")(x, attn_bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attention_ln")(x + attn)
        h = nn.Dense(c.intermediate_dim, dtype=self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_dim, dtype=self.dtype, name="ffn_output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")(x + h)


class BertEncoder(nn.Module):
    """Token ids -> contextual embeddings.

    __call__(input_ids (B, L), attention_mask (B, L) 1=valid,
             token_type_ids optional, pairwise_mask optional (B, L, L))
    returns dict(hidden=(B, L, C) fp32, masks=(B, L), aggregate=(B, C)).
    """
    cfg: LanguageConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 token_type_ids: Optional[jnp.ndarray] = None,
                 pairwise_mask: Optional[jnp.ndarray] = None):
        c = self.cfg
        B, L = input_ids.shape
        word = nn.Embed(c.vocab_size, c.hidden_dim, name="word_embeddings")(input_ids)
        if c.model_type == "roberta-base":
            # RoBERTa position ids: pad positions stay at padding_idx, the
            # i-th non-pad token gets padding_idx + i + 1 (HF
            # create_position_ids_from_input_ids semantics)
            nonpad = (input_ids != c.pad_token_id).astype(jnp.int32)
            pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + c.pad_token_id
        else:
            pos_ids = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
        pos = nn.Embed(c.max_position_embeddings, c.hidden_dim,
                       name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_dim,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="embeddings_ln")(word + pos + typ)
        x = x.astype(self.dtype)

        # additive bias: (B, 1, 1, L) from the key-side validity mask, plus an
        # optional (B, 1, L, L) pairwise mask (PARALLEL_DET block-diagonal)
        neg = jnp.asarray(-1e9, dtype=self.dtype)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
        if pairwise_mask is not None:
            bias = bias + jnp.where(pairwise_mask[:, None, :, :] > 0, 0.0, neg)

        for i in range(c.num_layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, bias)

        hidden = x.astype(jnp.float32)
        m = attention_mask.astype(jnp.float32)
        aggregate = (hidden * m[..., None]).sum(1) / jnp.maximum(
            m.sum(-1, keepdims=True), 1e-6)
        return {"hidden": hidden, "masks": attention_mask, "aggregate": aggregate}
