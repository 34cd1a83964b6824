import jax.numpy as jnp
import numpy as np

from uninext_tpu.utils import box_ops


def _np_iou(b1, b2):
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return inter / union, union


def test_cxcywh_roundtrip():
    rng = np.random.RandomState(0)
    b = rng.rand(32, 4).astype(np.float32)
    b[:, 2:] += 0.1
    out = box_ops.box_xyxy_to_cxcywh(box_ops.box_cxcywh_to_xyxy(jnp.array(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_pairwise_iou_matches_numpy():
    rng = np.random.RandomState(1)
    c1 = rng.rand(16, 4).astype(np.float32)
    c2 = rng.rand(9, 4).astype(np.float32)
    b1 = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.array(c1)))
    b2 = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.array(c2)))
    iou, _ = box_ops.box_iou(jnp.array(b1), jnp.array(b2))
    ref, _ = _np_iou(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), ref, atol=1e-5)


def test_generalized_iou_range_and_diag():
    rng = np.random.RandomState(2)
    c = rng.rand(8, 4).astype(np.float32)
    b = box_ops.box_cxcywh_to_xyxy(jnp.array(c))
    g = np.asarray(box_ops.generalized_box_iou(b, b))
    assert np.all(g <= 1.0 + 1e-6) and np.all(g >= -1.0 - 1e-6)
    np.testing.assert_allclose(np.diag(g), 1.0, atol=1e-5)


def test_elementwise_matches_pairwise_diag():
    rng = np.random.RandomState(3)
    b1 = box_ops.box_cxcywh_to_xyxy(jnp.array(rng.rand(12, 4).astype(np.float32)))
    b2 = box_ops.box_cxcywh_to_xyxy(jnp.array(rng.rand(12, 4).astype(np.float32)))
    pair, _ = box_ops.box_iou(b1, b2)
    elem = box_ops.elementwise_box_iou(b1, b2)
    np.testing.assert_allclose(np.diag(np.asarray(pair)), np.asarray(elem), atol=1e-5)
    g = box_ops.elementwise_giou_loss(b1, b2)
    gp = box_ops.generalized_box_iou(b1, b2)
    np.testing.assert_allclose(1.0 - np.diag(np.asarray(gp)), np.asarray(g), atol=1e-5)
