"""Matcher parity: device Hungarian vs scipy; simOTA invariants."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from uninext_tpu.models.matcher import (hungarian_match, ota_cost_and_iou,
                                        simota_match, vl_cost_matrix)


def test_hungarian_matches_scipy_exact_cost():
    rng = np.random.RandomState(0)
    for trial in range(5):
        Q, G = 40, 11
        n_valid = rng.randint(1, G + 1)
        cost = rng.randn(Q, G).astype(np.float32) * 10
        valid = np.zeros(G, bool)
        valid[:n_valid] = True
        q2g = np.asarray(hungarian_match(jnp.array(cost), jnp.array(valid)))
        rows, cols = linear_sum_assignment(cost[:, :n_valid].T)  # rows=gts
        # same total cost (assignments may differ on ties)
        ours = sum(cost[q, g] for q, g in enumerate(q2g) if g >= 0)
        ref = cost[:, :n_valid].T[rows, cols].sum()
        assert abs(ours - ref) < 1e-3, (trial, ours, ref)
        # each valid gt matched exactly once
        matched = q2g[q2g >= 0]
        assert sorted(matched.tolist()) == list(range(n_valid))


def test_hungarian_under_jit_and_vmap():
    rng = np.random.RandomState(1)
    B, Q, G = 3, 30, 8
    cost = rng.randn(B, Q, G).astype(np.float32)
    valid = np.ones((B, G), bool)
    valid[1, 5:] = False
    f = jax.jit(jax.vmap(hungarian_match))
    q2g = np.asarray(f(jnp.array(cost), jnp.array(valid)))
    for b in range(B):
        nv = valid[b].sum()
        rows, cols = linear_sum_assignment(cost[b][:, :nv].T)
        ours = sum(cost[b][q, g] for q, g in enumerate(q2g[b]) if g >= 0)
        assert abs(ours - cost[b][:, :nv].T[rows, cols].sum()) < 1e-3


def test_vl_cost_matches_manual():
    rng = np.random.RandomState(2)
    Q, G, T = 12, 4, 16
    logits = rng.randn(Q, T).astype(np.float32)
    boxes = rng.rand(Q, 4).astype(np.float32) * 0.5 + 0.25
    gt_boxes = rng.rand(G, 4).astype(np.float32) * 0.5 + 0.25
    pm = np.zeros((G, T), bool)
    for g in range(G):
        pm[g, rng.choice(T, size=rng.randint(1, 4), replace=False)] = True
    valid = np.ones(G, bool)
    C = np.asarray(vl_cost_matrix(jnp.array(logits), jnp.array(boxes),
                                  jnp.array(pm), jnp.array(gt_boxes),
                                  jnp.array(valid)))
    # manual focal-cost for one (q, g)
    alpha, gamma = 0.25, 2.0
    prob = 1 / (1 + np.exp(-logits))
    neg = (1 - alpha) * prob ** gamma * (-np.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-np.log(prob + 1e-8))
    q, g = 3, 2
    cls = (pos[q, pm[g]] - neg[q, pm[g]]).mean()
    l1 = np.abs(boxes[q] - gt_boxes[g]).sum()

    def xyxy(b):
        return np.array([b[0]-b[2]/2, b[1]-b[3]/2, b[0]+b[2]/2, b[1]+b[3]/2])

    b1, b2 = xyxy(boxes[q]), xyxy(gt_boxes[g])
    lt, rb = np.maximum(b1[:2], b2[:2]), np.minimum(b1[2:], b2[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    a1 = (b1[2]-b1[0])*(b1[3]-b1[1]); a2 = (b2[2]-b2[0])*(b2[3]-b2[1])
    union = a1 + a2 - inter
    ltc, rbc = np.minimum(b1[:2], b2[:2]), np.maximum(b1[2:], b2[2:])
    area_c = (rbc - ltc)[0] * (rbc - ltc)[1]
    giou = inter/union - (area_c - union)/area_c
    expected = 2.0 * cls + 5.0 * l1 + 2.0 * (-giou)
    np.testing.assert_allclose(C[q, g], expected, rtol=1e-4)


def test_simota_invariants():
    rng = np.random.RandomState(3)
    Q, G, T = 100, 7, 16
    logits = rng.randn(Q, T).astype(np.float32)
    boxes = np.clip(rng.rand(Q, 4).astype(np.float32), 0.05, 0.95)
    boxes[:, 2:] = np.clip(boxes[:, 2:], 0.05, 0.4)
    gt_boxes = np.clip(rng.rand(G, 4).astype(np.float32), 0.2, 0.8)
    gt_boxes[:, 2:] = np.clip(gt_boxes[:, 2:], 0.2, 0.5)
    pm = np.zeros((G, T), bool)
    pm[np.arange(G), rng.randint(0, T, G)] = True
    valid = np.array([True] * 5 + [False] * 2)
    cost, iou = ota_cost_and_iou(jnp.array(logits), jnp.array(boxes),
                                 jnp.array(pm), jnp.array(gt_boxes),
                                 jnp.array(valid))
    q2g, g2q = jax.jit(simota_match)(cost, iou, jnp.array(valid))
    q2g, g2q = np.asarray(q2g), np.asarray(g2q)
    # every valid gt has >= 1 matched query; invalid gts have none
    for g in range(G):
        n = (q2g == g).sum()
        if valid[g]:
            assert n >= 1, g
            assert g2q[g] >= 0 and q2g[g2q[g]] == g
        else:
            assert n == 0
    # one gt per query max (by construction of q2g) — check best-query claim
    assert (q2g < G).all()
