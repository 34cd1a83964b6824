"""Parity tests for multi-scale deformable attention.

The reference validates its CUDA kernel against a pure-torch grid_sample
implementation in fp64 (`ops/test.py:31-40`). We do the same: an independent
fp64 numpy implementation of the op's definition (bilinear sample with
align_corners=False / zero padding; attention-weighted reduction) is the
ground truth.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uninext_tpu.ops.msda import ms_deform_attn

SHAPES = ((6, 4), (3, 2))  # (H, W) per level


def numpy_msda(value, spatial_shapes, locs, attn):
    """fp64 reference: value (B,S,M,D), locs (B,Lq,M,L,P,2), attn (B,Lq,M,L,P)."""
    value = value.astype(np.float64)
    locs = locs.astype(np.float64)
    attn = attn.astype(np.float64)
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = locs.shape
    out = np.zeros((B, Lq, M, D))
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, start:start + H * W].reshape(B, H, W, M, D)
        start += H * W
        for b in range(B):
            for q in range(Lq):
                for m in range(M):
                    for p in range(P):
                        x = locs[b, q, m, lvl, p, 0] * W - 0.5
                        y = locs[b, q, m, lvl, p, 1] * H - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        fx, fy = x - x0, y - y0
                        acc = np.zeros(D)
                        for (iy, ix, w) in ((y0, x0, (1 - fx) * (1 - fy)),
                                            (y0, x0 + 1, fx * (1 - fy)),
                                            (y0 + 1, x0, (1 - fx) * fy),
                                            (y0 + 1, x0 + 1, fx * fy)):
                            if 0 <= iy < H and 0 <= ix < W:
                                acc += w * v[b, iy, ix, m]
                        out[b, q, m] += attn[b, q, m, lvl, p] * acc
    return out.reshape(B, Lq, M * D)


def _random_inputs(seed=0, B=2, Lq=7, M=2, D=4, P=3):
    rng = np.random.RandomState(seed)
    S = sum(h * w for h, w in SHAPES)
    L = len(SHAPES)
    value = rng.randn(B, S, M, D).astype(np.float32)
    # cover in-range, boundary and out-of-range samples
    locs = rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attn /= attn.reshape(B, Lq, M, -1).sum(-1).reshape(B, Lq, M, 1, 1)
    return value, locs, attn


def test_forward_matches_fp64_reference():
    value, locs, attn = _random_inputs()
    ref = numpy_msda(value, SHAPES, locs, attn)
    out = ms_deform_attn(jnp.array(value), SHAPES, jnp.array(locs), jnp.array(attn))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_forward_jit_and_grad():
    value, locs, attn = _random_inputs(seed=1)

    @jax.jit
    def f(v, l, a):
        return ms_deform_attn(v, SHAPES, l, a).sum()

    g = jax.grad(f, argnums=(0, 1, 2))(jnp.array(value), jnp.array(locs),
                                       jnp.array(attn))
    for gi, x in zip(g, (value, locs, attn)):
        assert gi.shape == x.shape
        assert np.all(np.isfinite(np.asarray(gi)))
    # grad wrt value must be nonzero (gather backward -> scatter)
    assert np.abs(np.asarray(g[0])).sum() > 0


def test_grad_matches_finite_differences():
    # small case; check d(out.sum())/d(value) against central differences
    value, locs, attn = _random_inputs(seed=2, B=1, Lq=3, M=1, D=2, P=2)

    def f_np(v):
        return numpy_msda(v, SHAPES, locs, attn).sum()

    g = jax.grad(lambda v: ms_deform_attn(v, SHAPES, jnp.array(locs),
                                          jnp.array(attn)).sum())(jnp.array(value))
    g = np.asarray(g)
    rng = np.random.RandomState(3)
    for _ in range(10):
        i = tuple(rng.randint(s) for s in value.shape)
        eps = 1e-3
        vp, vm = value.copy(), value.copy()
        vp[i] += eps
        vm[i] -= eps
        fd = (f_np(vp) - f_np(vm)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-3, atol=1e-4)


def test_attention_weight_identity():
    # with all weight on a single point placed exactly on a pixel center,
    # output equals that pixel's value
    H, W = SHAPES[0]
    B, M, D = 1, 1, 3
    S = sum(h * w for h, w in SHAPES)
    value = np.arange(B * S * M * D, dtype=np.float32).reshape(B, S, M, D)
    # pixel (row 2, col 1) center: x = (1 + 0.5)/W, y = (2 + 0.5)/H
    locs = np.zeros((B, 1, M, 2, 1, 2), dtype=np.float32)
    locs[..., 0, 0, 0] = (1 + 0.5) / W
    locs[..., 0, 0, 1] = (2 + 0.5) / H
    attn = np.zeros((B, 1, M, 2, 1), dtype=np.float32)
    attn[:, :, :, 0, 0] = 1.0
    out = ms_deform_attn(jnp.array(value), SHAPES, jnp.array(locs), jnp.array(attn))
    expected = value[0, 2 * W + 1, 0]
    np.testing.assert_allclose(np.asarray(out)[0, 0], expected, atol=1e-5)


def test_custom_vjp_matches_ad_of_unpacked():
    """The packed op's hand-written VJP (scatter-add + regather fold) must
    match pure AD of the independent unpacked formulation in float64 for all
    three gradients, including border and out-of-range samples."""
    from uninext_tpu.ops.msda import ms_deform_attn_unpacked
    jax.config.update("jax_enable_x64", True)
    try:
        value, locs, attn = _random_inputs(seed=3)
        value = jnp.array(value, jnp.float64)
        locs = jnp.array(locs, jnp.float64)
        attn = jnp.array(attn, jnp.float64)
        dy = jnp.array(np.random.RandomState(9).randn(*(
            value.shape[0], locs.shape[1],
            value.shape[2] * value.shape[3])), jnp.float64)

        def loss_packed(v, l, a):
            return (ms_deform_attn(v, SHAPES, l, a) * dy).sum()

        def loss_unpacked(v, l, a):
            return (ms_deform_attn_unpacked(v, SHAPES, l, a) * dy).sum()

        gp = jax.grad(loss_packed, argnums=(0, 1, 2))(value, locs, attn)
        gu = jax.grad(loss_unpacked, argnums=(0, 1, 2))(value, locs, attn)
        for name, a, b in zip(("dvalue", "dloc", "datt"), gp, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-9, err_msg=name)
    finally:
        jax.config.update("jax_enable_x64", False)
