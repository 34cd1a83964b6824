"""Numerical parity of VL components against torch mirrors.

The reference's math re-expressed in torch (independently, from the same
equations) with shared weights must match our flax modules.
"""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from uninext_tpu.config import LanguageConfig, TransformerConfig
from uninext_tpu.models.heads import VLAlign
from uninext_tpu.models.vl_fusion import BiMultiHeadAttention


def _dense_np(x, kernel, bias):
    return x @ kernel + bias


def test_bi_attention_matches_torch():
    rng = np.random.RandomState(0)
    B, Nv, Nl = 2, 12, 7
    v_dim, l_dim, e_dim, H = 16, 24, 32, 4
    v = rng.randn(B, Nv, v_dim).astype(np.float32)
    l = rng.randn(B, Nl, l_dim).astype(np.float32)
    l_mask = np.ones((B, Nl), np.int32)
    l_mask[0, 5:] = 0

    mod = BiMultiHeadAttention(v_dim=v_dim, l_dim=l_dim, embed_dim=e_dim,
                               num_heads=H)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(v), jnp.array(l),
                      jnp.array(l_mask))
    out_v, out_l = mod.apply(params, jnp.array(v), jnp.array(l),
                             jnp.array(l_mask))

    p = jax.tree.map(np.asarray, params)["params"]
    Dh = e_dim // H
    scale = Dh ** -0.5

    def proj(x, name):
        k, b = p[name]["kernel"], p[name]["bias"]
        return torch.from_numpy(x @ k + b)

    q = proj(v, "v_proj") * scale
    k = proj(l, "l_proj")
    vv = proj(v, "values_v_proj")
    vl = proj(l, "values_l_proj")

    def heads(x, n):
        return x.view(B, n, H, Dh).transpose(1, 2)  # (B, H, n, Dh)

    attn = heads(q, Nv) @ heads(k, Nl).transpose(-1, -2)
    attn = attn.clamp(-50000, 50000)
    attn_t = attn.transpose(-1, -2)
    attn_t = (attn_t - attn_t.max(dim=-1, keepdim=True).values).clamp(
        -50000, 50000)
    probs_l = attn_t.softmax(-1)
    mask_bias = torch.from_numpy(
        np.where(l_mask[:, None, None, :] > 0, 0.0, -9e15).astype(np.float32))
    probs_v = (attn + mask_bias).softmax(-1)
    o_v = (probs_v @ heads(vl, Nl)).transpose(1, 2).reshape(B, Nv, e_dim)
    o_l = (probs_l @ heads(vv, Nv)).transpose(1, 2).reshape(B, Nl, e_dim)
    exp_v = o_v.numpy() @ p["out_v_proj"]["kernel"] + p["out_v_proj"]["bias"]
    exp_l = o_l.numpy() @ p["out_l_proj"]["kernel"] + p["out_l_proj"]["bias"]

    np.testing.assert_allclose(np.asarray(out_v), exp_v, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_l), exp_l, atol=2e-4, rtol=1e-4)


def test_vl_align_matches_torch():
    rng = np.random.RandomState(1)
    B, Q, L, lang_dim = 2, 9, 6, 24
    tcfg = TransformerConfig(d_model=16, log_scale=0.3)
    x = rng.randn(B, Q, 16).astype(np.float32)
    emb = rng.randn(B, L, lang_dim).astype(np.float32)

    mod = VLAlign(tcfg, lang_dim=lang_dim)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(emb))
    out = np.asarray(mod.apply(params, jnp.array(x), jnp.array(emb)))

    p = jax.tree.map(np.asarray, params)["params"]
    e = torch.from_numpy(emb)
    e = F.normalize(e, p=2, dim=-1)
    tok = (e.numpy() / 2.0) @ p["dot_product_projection_text"]["kernel"] \
        + p["dot_product_projection_text"]["bias"]
    bias = e.numpy() @ p["bias_lang"] + p["bias0"]
    logits = (x @ tok.transpose(0, 2, 1)) / np.exp(p["log_scale"]) \
        + bias[:, None, :]
    logits = np.clip(logits, -50000, 50000)
    np.testing.assert_allclose(out, logits, atol=2e-4, rtol=1e-4)
