"""Mask-head numerics: aligned_bilinear vs torch reference semantics."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from uninext_tpu.models.mask_head import aligned_bilinear, dynamic_mask_forward
from uninext_tpu.config import MaskHeadConfig


def torch_aligned_bilinear(tensor, factor):
    # independent re-derivation of the CondInst convention using torch ops
    # (pad-right replicate, align_corners=True resize, pad-left, crop)
    h, w = tensor.shape[2:]
    t = F.pad(tensor, pad=(0, 1, 0, 1), mode="replicate")
    oh, ow = factor * h + 1, factor * w + 1
    t = F.interpolate(t, size=(oh, ow), mode="bilinear", align_corners=True)
    t = F.pad(t, pad=(factor // 2, 0, factor // 2, 0), mode="replicate")
    return t[:, :, :oh - 1, :ow - 1]


def test_aligned_bilinear_matches_torch():
    rng = np.random.RandomState(0)
    for factor in (2, 4):
        x = rng.randn(2, 3, 7, 9).astype(np.float32)
        ref = torch_aligned_bilinear(torch.from_numpy(x), factor).numpy()
        ours = np.asarray(aligned_bilinear(jnp.array(x), factor))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_dynamic_mask_forward_manual():
    """3-layer dynamic conv == manual per-instance matmul chain."""
    cfg = MaskHeadConfig(dynamic_mask_channels=4, controller_layers=3,
                         mask_out_stride=4, rel_coord=True)
    B, N, H, W, C = 1, 2, 6, 8, 2
    rng = np.random.RandomState(1)
    feats = rng.randn(B, H, W, C).astype(np.float32)
    refp = rng.rand(B, N, 2).astype(np.float32) * 40
    ch = 4
    wsz = [(C + 2) * ch, ch * ch, ch * 1]
    bsz = [ch, ch, 1]
    params = rng.randn(B, N, sum(wsz) + sum(bsz)).astype(np.float32)
    out = np.asarray(dynamic_mask_forward(jnp.array(feats), jnp.array(refp),
                                          jnp.array(params), cfg,
                                          mask_feat_stride=8))
    assert out.shape == (B, N, H * 2, W * 2)

    # manual for instance 0 at the pre-upsample grid point (y=1, x=3)
    ys = np.arange(H) * 8 + 4
    xs = np.arange(W) * 8 + 4
    y_i, x_i = 1, 3
    rel = refp[0, 0] - np.array([xs[x_i], ys[y_i]])
    inp = np.concatenate([rel, feats[0, y_i, x_i]])
    p = params[0, 0]
    o = 0
    w1 = p[:wsz[0]].reshape(ch, C + 2); o += wsz[0]
    w2 = p[o:o + wsz[1]].reshape(ch, ch); o += wsz[1]
    w3 = p[o:o + wsz[2]].reshape(1, ch); o += wsz[2]
    b1 = p[o:o + ch]; o += ch
    b2 = p[o:o + ch]; o += ch
    b3 = p[o:o + 1]
    h = np.maximum(w1 @ inp + b1, 0)
    h = np.maximum(w2 @ h + b2, 0)
    expected = (w3 @ h + b3)[0]
    # compare against the pre-upsample value recovered from aligned_bilinear:
    # factor 2 with left-pad 1 means out[2y+1, 2x+1] == in[y, x] for interior
    got = out[0, 0, 2 * y_i + 1, 2 * x_i + 1]
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)
