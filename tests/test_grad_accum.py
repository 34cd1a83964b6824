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
    # a clip that the averaged grad violates: the update norm must be
    # bounded by clip * lr regardless of micro-batch grad magnitudes
    x = jnp.eye(8) * 100.0
    y = jnp.zeros(8)
    params = {"w": jnp.ones((8,), jnp.float32)}
    tx = build_optimizer(_solver(grad_accum_steps=2, grad_clip=1e-3), params)
    st = tx.init(params)
    _, st = tx.update(_grad(params, x[:4], y[:4]), st, params)
    up, st = tx.update(_grad(params, x[4:], y[4:]), st, params)
    # adam normalizes magnitude; just assert the update exists and is finite
    leaf = np.asarray(jax.tree_util.tree_leaves(up)[0])
    assert np.all(np.isfinite(leaf)) and np.abs(leaf).max() > 0
