"""Prediction heads: VL alignment classifier, binary encoder classifier.

Parity anchors:
  * VL_Align        — reference deformable_detr.py:35-68 (L2-normalized text
                      embedding, /2 projection, log-scale temperature,
                      language bias, +/-50000 clamps)
  * Still_Classifier— deformable_detr.py:70-76 (binary objectness; the
                      encoder proposal head when STILL_CLS_FOR_ENCODER)
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..config import TransformerConfig


class VLAlign(nn.Module):
    cfg: TransformerConfig
    lang_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
        """x: (B, Q, 256) queries; embedding: (B, L, 768) language tokens.
        Returns alignment logits (B, Q, L)."""
        c = self.cfg
        bias_value = -math.log((1 - c.prior_prob) / c.prior_prob)
        emb = embedding / jnp.maximum(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-12)
        tokens = nn.Dense(c.d_model, name="dot_product_projection_text")(emb / 2.0)
        bias_lang = self.param("bias_lang", nn.initializers.zeros, (self.lang_dim,))
        bias0 = self.param("bias0", nn.initializers.constant(bias_value), (1,))
        token_bias = jnp.einsum("blc,c->bl", emb, bias_lang) + bias0  # (B, L)
        log_scale = self.param("log_scale",
                               nn.initializers.constant(c.log_scale), (1,))
        logits = (jnp.einsum("bqc,blc->bql", x.astype(jnp.float32),
                             tokens.astype(jnp.float32))
                  / jnp.exp(log_scale)) + token_bias[:, None, :]
        if c.clamp_dot_product:
            logits = jnp.clip(logits, -50000, 50000)
        return logits


class StillClassifier(nn.Module):
    """Binary objectness head; same call signature as VLAlign."""
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray, lang_feat=None) -> jnp.ndarray:
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        return nn.Dense(1, bias_init=nn.initializers.constant(bias_value),
                        name="body")(x.astype(jnp.float32))
