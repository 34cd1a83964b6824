"""Gradient accumulation (solver.grad_accum_steps) — the single-chip route
to the reference's 32-image global batch (image_joint_r50.yaml:29, bs=32
over 16 GPUs). k micro-steps with averaged grads + ONE clipped update must
equal one full-batch step, and micro-steps in between must not move params.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uninext_tpu.config import SolverConfig
from uninext_tpu.engine.optimizer import build_optimizer


def _solver(**kw):
    base = dict(base_lr=1e-2, warmup_iters=0, warmup_factor=1.0,
                steps=(10 ** 6,), max_iter=100, grad_clip=1e9,
                weight_decay=0.0)
    base.update(kw)
    return dataclasses.replace(SolverConfig(), **base)


def _setup(accum):
    params = {"w": jnp.asarray(np.linspace(-1, 1, 8), jnp.float32)}
    tx = build_optimizer(_solver(grad_accum_steps=accum), params)
    return params, tx, tx.init(params)


def _grad(params, x, y):
    def loss(p):
        return jnp.mean((x @ p["w"] - y) ** 2)
    return jax.grad(loss)(params)


def test_accum_equals_full_batch():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 8), jnp.float32)
    y = jnp.asarray(rng.randn(8), jnp.float32)

    p_full, tx_full, st_full = _setup(accum=1)
    g = _grad(p_full, x, y)
    up, _ = tx_full.update(g, st_full, p_full)
    p_full = jax.tree_util.tree_map(lambda a, b: a + b, p_full, up)

    p_acc, tx_acc, st_acc = _setup(accum=2)
    # micro-step 1 (first half-batch): NO param change yet
    g1 = _grad(p_acc, x[:4], y[:4])
    up1, st_acc = tx_acc.update(g1, st_acc, p_acc)
    assert all(float(jnp.abs(v).max()) == 0.0
               for v in jax.tree_util.tree_leaves(up1))
    # micro-step 2: averaged grad -> one clipped AdamW update
    g2 = _grad(p_acc, x[4:], y[4:])
    up2, st_acc = tx_acc.update(g2, st_acc, p_acc)
    p_acc = jax.tree_util.tree_map(lambda a, b: a + b, p_acc, up2)

    np.testing.assert_allclose(np.asarray(p_acc["w"]),
                               np.asarray(p_full["w"]), rtol=1e-6)


def test_clip_applies_to_averaged_grad():
    """The k=2 update must equal a k=1 optimizer fed the MEAN of the two
    micro-grads, with clip_by_global_norm applied to that averaged grad —
    NOT per micro-batch (ADVICE r3: the old assertion could not tell the
    difference).

    Adam's first step is element-wise sign-like, so magnitude-only
    differences between the two clip orders vanish through it; the grads
    below are built so the SIGN of element 0 differs: g1[0]=+10 inside a
    huge-norm grad (clips to ~1e-5), g2[0]=-1 inside a unit-norm grad
    (clips to ~-1e-3). clip(mean)[0] > 0 but mean(clip)[0] < 0."""
    params = {"w": jnp.ones((8,), jnp.float32)}
    g1 = {"w": jnp.array([10.0, 1000.0, 1, 1, 1, 1, 1, 1], jnp.float32)}
    g2 = {"w": jnp.array([-1.0, 0.01, 0, 0, 0, 0, 0, 0], jnp.float32)}

    tx = build_optimizer(_solver(grad_accum_steps=2, grad_clip=1e-3), params)
    st = tx.init(params)
    up1, st = tx.update(g1, st, params)
    assert float(jnp.abs(up1["w"]).max()) == 0.0   # no move mid-accumulation
    up, st = tx.update(g2, st, params)

    # correct semantics: one clipped update of the averaged grad
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
    tx1 = build_optimizer(_solver(grad_accum_steps=1, grad_clip=1e-3), params)
    ref_up, _ = tx1.update(gmean, tx1.init(params), params)
    np.testing.assert_allclose(np.asarray(up["w"]),
                               np.asarray(ref_up["w"]), rtol=1e-6)

    # wrong semantics (per-micro-batch clip, then average): element 0 has
    # the opposite sign, so even through Adam the updates must differ
    clipped_each = jax.tree_util.tree_map(
        lambda a, b: (a * jnp.minimum(1.0, 1e-3 / jnp.linalg.norm(a))
                      + b * jnp.minimum(1.0, 1e-3 / jnp.linalg.norm(b)))
        / 2.0, g1, g2)
    assert float(gmean["w"][0]) > 0 > float(clipped_each["w"][0])
    ref2_up, _ = tx1.update(clipped_each, tx1.init(params), params)
    assert not np.allclose(np.asarray(up["w"]), np.asarray(ref2_up["w"]),
                           rtol=1e-4)


def test_adam_mu_dtype_bf16():
    """SolverConfig.adam_mu_dtype='bfloat16' must store Adam's first moment
    in bf16 (the single-chip ViT-H memory lever, docs/PERF.md) and keep the
    update direction within bf16 tolerance of the f32 optimizer."""
    params = {"w": jnp.asarray(np.linspace(-1, 1, 8), jnp.float32)}
    tx16 = build_optimizer(_solver(adam_mu_dtype="bfloat16"), params)
    tx32 = build_optimizer(_solver(), params)
    s16, s32 = tx16.init(params), tx32.init(params)
    mu16 = [x for x in jax.tree_util.tree_leaves(s16)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert mu16, "no bf16 moment buffers found"
    mu32 = [x for x in jax.tree_util.tree_leaves(s32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert not mu32, "f32 optimizer must not hold bf16 buffers"
    g = _grad(params, jnp.eye(8, dtype=jnp.float32), jnp.zeros(8))
    up16, _ = tx16.update(g, s16, params)
    up32, _ = tx32.update(g, s32, params)
    np.testing.assert_allclose(np.asarray(up16["w"], np.float32),
                               np.asarray(up32["w"], np.float32),
                               rtol=2e-2, atol=1e-6)
