"""ViT backbone parity vs the reference's own torch code (numerical oracle).

Loads /root/reference/projects/UNINEXT/uninext/backbone/{vit,utils}.py via
the import shims, randomizes a small ViT, converts its state_dict through
engine.convert.convert_vit, and asserts our flax ViT matches end-to-end at
a resolution DIFFERENT from the rel-pos/abs-pos init sizes — exercising the
get_rel_pos linear interpolation, get_abs_pos bicubic interpolation, and
window padding paths. Also checks the q-chunked global attention variant
is exact vs unchunked.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from uninext_tpu.engine.convert import convert_vit, jax_tree_to_numpy  # noqa: E402
from uninext_tpu.models.vit import ViT, torch_bicubic_resize_2d  # noqa: E402

PREFIX = "detr.detr.backbone.0.backbone."


def _load_reference_vit():
    from tests.torch_ref_shim import install_detectron2_shim, _load_file
    install_detectron2_shim()
    REF = "/root/reference/projects/UNINEXT/uninext/backbone"
    _load_file("uninext.backbone.utils", f"{REF}/utils.py")
    return _load_file("uninext.backbone.vit", f"{REF}/vit.py")


def _build_pair(q_chunk_rows=0):
    vit_mod = _load_reference_vit()
    torch.manual_seed(0)
    ref = vit_mod.ViT(
        img_size=64,              # rel-pos init span: 64/16 = 4
        patch_size=16,
        embed_dim=64,
        depth=4,
        num_heads=2,
        window_size=4,
        window_block_indexes=(0, 2),
        use_rel_pos=True,
        use_abs_pos=True,
        pretrain_img_size=64,     # abs-pos grid 4x4 (+cls)
        drop_path_rate=0.0,
        norm_layer=__import__("functools").partial(
            torch.nn.LayerNorm, eps=1e-6),   # D2ViT production setting
        out_feature="last_feat",
    ).eval()
    # randomize everything (rel-pos init is zeros by default)
    sd = ref.state_dict()
    g = torch.Generator().manual_seed(7)
    for k, v in sd.items():
        sd[k] = torch.randn(v.shape, generator=g) * 0.05
    ref.load_state_dict(sd)

    ours = ViT(patch_size=16, embed_dim=64, depth=4, num_heads=2,
               window_size=4, global_blocks=(1, 3), drop_path_rate=0.0,
               pretrain_img_size=64, rel_pos_init_size=4,
               global_q_chunk_rows=q_chunk_rows)
    return ref, ours, {PREFIX + k: v for k, v in sd.items()}


def _convert(ours, sd, x_shape):
    params = ours.init(jax.random.PRNGKey(0), jnp.zeros(x_shape))
    tree = jax_tree_to_numpy(params)["params"]
    report = {"loaded": 0, "missing_target": [], "shape_mismatch": []}
    convert_vit(sd, {"backbone": tree}, report, dst_root="backbone")
    assert not report["missing_target"], report["missing_target"]
    assert not report["shape_mismatch"], report["shape_mismatch"]
    return {"params": tree}, report


def test_vit_matches_reference_at_new_resolution():
    ref, ours, sd = _build_pair()
    # 96px -> 6x6 tokens: abs-pos 4x4 -> 6x6 bicubic, global rel-pos 7 -> 11
    # linear interp, window pad 6 -> 8 all exercised
    x = np.random.RandomState(1).randn(2, 96, 96, 3).astype(np.float32)
    params, report = _convert(ours, sd, x.shape)
    n_torch = len(sd)
    assert report["loaded"] == n_torch, (report["loaded"], n_torch)

    with torch.no_grad():
        out_t = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    out_j = jax.jit(lambda p, v: ours.apply(p, v))(params, jnp.asarray(x))

    for name in ("res3", "res4", "res5"):
        t = out_t[name].permute(0, 2, 3, 1).numpy()
        j = np.asarray(out_j[name])
        assert j.shape == t.shape, (name, j.shape, t.shape)
        err = np.abs(j - t).max()
        assert err < 2e-4, (name, err)


def test_vit_q_chunked_global_attention_is_exact():
    _, ours0, sd = _build_pair(q_chunk_rows=0)
    _, ours3, _ = _build_pair(q_chunk_rows=3)
    x = np.random.RandomState(2).randn(1, 96, 96, 3).astype(np.float32)
    params, _ = _convert(ours0, sd, x.shape)
    a = jax.jit(lambda p, v: ours0.apply(p, v))(params, jnp.asarray(x))
    b = jax.jit(lambda p, v: ours3.apply(p, v))(params, jnp.asarray(x))
    for name in ("res3", "res4", "res5"):
        np.testing.assert_allclose(np.asarray(a[name]), np.asarray(b[name]),
                                   atol=1e-5)


def test_torch_bicubic_resize_matches_torch():
    x = np.random.RandomState(3).randn(5, 7, 6).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(2, 0, 1)[None], size=(9, 13),
        mode="bicubic", align_corners=False)[0].permute(1, 2, 0).numpy()
    got = np.asarray(torch_bicubic_resize_2d(jnp.asarray(x), 9, 13))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vit_drop_path_active_in_training():
    """Drop-path must perturb outputs under train rngs and stay mean-
    preserving in expectation (smoke: train != eval at rate 0.9)."""
    ours = ViT(patch_size=16, embed_dim=32, depth=2, num_heads=2,
               window_size=4, global_blocks=(1,), drop_path_rate=0.9,
               pretrain_img_size=64, rel_pos_init_size=4)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 64, 64, 3),
                    jnp.float32)
    params = ours.init(jax.random.PRNGKey(0), x)
    ev = ours.apply(params, x)
    tr = ours.apply(params, x, deterministic=False,
                    rngs={"droppath": jax.random.PRNGKey(5)})
    assert not np.allclose(np.asarray(ev["res4"]), np.asarray(tr["res4"]))


def test_flash_concat_formulation_matches_xla_path(monkeypatch):
    """The flash path folds the decomposed rel-pos bias into the qk matmul
    via feature concat (models/vit.py flash_rel_pos_attention). On CPU,
    substitute a plain-XLA reference for the Pallas kernel: this validates
    the concat/one-hot/pad-flag construction exactly; the kernel itself is
    parity-checked on TPU (tools recordings: 6e-06 at ViT-H scale)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa_mod
    from uninext_tpu.models.vit import Attention

    def plain_flash(q, k, v, ab=None, segment_ids=None, *, causal=False,
                    sm_scale=1.0, block_sizes=None, debug=False):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * sm_scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    monkeypatch.setattr(fa_mod, "flash_attention", plain_flash)

    from uninext_tpu.models.vit import flash_rel_pos_attention
    H, W, nh, hd = 9, 11, 4, 8   # S=99 -> pads to 256: exercises pad flag
    S = H * W
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, H, W, nh, hd), jnp.float32)
    k = jnp.asarray(rng.randn(2, S, nh, hd), jnp.float32)
    v = jnp.asarray(rng.randn(2, S, nh, hd), jnp.float32)
    Rh = jnp.asarray(rng.randn(H, H, hd), jnp.float32)
    Rw = jnp.asarray(rng.randn(W, W, hd), jnp.float32)
    scale = 1.0 / np.sqrt(hd)
    got = flash_rel_pos_attention(q, k, v, Rh, Rw, scale)

    attn = jnp.einsum("byxhd,bkhd->bhyxk", q * scale, k)
    bh = jnp.einsum("byxhd,yid->bhyxi", q, Rh)
    bw = jnp.einsum("byxhd,xjd->bhyxj", q, Rw)
    attn = (attn.reshape(2, nh, H, W, H, W) + bh[..., :, None]
            + bw[..., None, :]).reshape(2, nh, S, S)
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1)
    want = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(2, H, W, nh * hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_vit_block_remat_is_exact_and_differentiable():
    """vit_use_checkpoint (reference MODEL.VIT.USE_CHECKPOINT, True in every
    *vit_huge training yaml): remat must not change the forward and must
    yield nonzero grads through every block."""
    kw = dict(patch_size=16, embed_dim=32, depth=2, num_heads=2,
              window_size=4, global_blocks=(1,), drop_path_rate=0.0,
              pretrain_img_size=64, rel_pos_init_size=4, use_flash=False)
    on = ViT(remat_blocks=True, **kw)
    off = ViT(remat_blocks=False, **kw)
    x = jnp.asarray(np.random.RandomState(6).randn(1, 64, 96, 3),
                    jnp.float32)
    params = on.init(jax.random.PRNGKey(0), x)
    a, b = on.apply(params, x), off.apply(params, x)
    for name in ("res3", "res4", "res5"):
        np.testing.assert_allclose(np.asarray(a[name]), np.asarray(b[name]),
                                   atol=1e-6)

    def loss(p):
        return sum(jnp.sum(v ** 2) for v in on.apply(p, x).values())

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(v).sum())
             for v in jax.tree_util.tree_leaves(g["params"])]
    assert all(n > 0 for n in norms if n == n)  # every leaf touched
