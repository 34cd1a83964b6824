"""Small jit-safe helpers shared across the model."""
from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Parity: reference uninext/util/misc.py inverse_sigmoid."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def agg_lang_feat(features: jnp.ndarray, mask: jnp.ndarray,
                  pool_type: str = "average") -> jnp.ndarray:
    """Masked pooling of language features.

    features: (B, L, C); mask: (B, L) with 1 for valid tokens.
    Parity: reference deformable_transformer.py:28-43 agg_lang_feat.
    """
    m = mask.astype(features.dtype)
    if pool_type == "average":
        return (features * m[..., None]).sum(axis=1) / jnp.maximum(
            m.sum(axis=-1, keepdims=True), 1e-6)
    if pool_type == "max":
        neg = jnp.finfo(features.dtype).min
        return jnp.where(m[..., None] > 0, features, neg).max(axis=1)
    raise ValueError("pool_type should be average or max")


def masked_fill(x: jnp.ndarray, mask: jnp.ndarray, value) -> jnp.ndarray:
    """torch.masked_fill equivalent; mask broadcasts against x."""
    return jnp.where(mask, jnp.asarray(value, dtype=x.dtype), x)
