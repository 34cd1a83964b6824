"""Tracker state machines: identity persistence + new-track creation."""
import numpy as np

from uninext_tpu.models.trackers import IDOLTracker, QuasiDenseTracker


def _frame(rng, centers, embeds, score=0.9, size=20):
    n = len(centers)
    boxes = np.array([[c[0] - size, c[1] - size, c[0] + size, c[1] + size]
                      for c in centers], np.float32)
    scores = np.full(n, score, np.float32)
    labels = np.zeros(n, np.int64)
    return boxes, scores, labels, embeds


def test_idol_tracker_keeps_identity():
    rng = np.random.RandomState(0)
    e1 = rng.randn(16).astype(np.float32) * 5
    e2 = -e1
    masks = np.zeros((2, 32, 32), np.float32) - 5.0
    masks[0, :10, :10] = 5.0
    masks[1, 20:, 20:] = 5.0
    tr = IDOLTracker()
    ids_seen = []
    for f in range(5):
        boxes, scores, labels, embeds = _frame(
            rng, [(30 + f, 30), (200, 200 + f)], np.stack([e1, e2]))
        keep, ids = tr.match(boxes, scores, labels, masks, embeds, f)
        ids_seen.append(ids.copy())
    first = ids_seen[0]
    assert set(first.tolist()) == {0, 1}
    for ids in ids_seen[1:]:
        np.testing.assert_array_equal(np.sort(ids), np.sort(first))


def test_idol_tracker_new_object_gets_new_id():
    rng = np.random.RandomState(1)
    e1 = rng.randn(16).astype(np.float32) * 5
    e3 = rng.randn(16).astype(np.float32) * 5
    m1 = np.zeros((1, 32, 32), np.float32) - 5
    m1[0, :8, :8] = 5
    tr = IDOLTracker()
    _, ids0 = tr.match(
        np.array([[10, 10, 50, 50]], np.float32),
        np.array([0.9], np.float32), np.zeros(1, np.int64), m1, e1[None], 0)
    m2 = np.zeros((2, 32, 32), np.float32) - 5
    m2[0, :8, :8] = 5
    m2[1, 24:, 24:] = 5
    boxes = np.array([[10, 10, 50, 50], [200, 200, 240, 240]], np.float32)
    _, ids1 = tr.match(boxes, np.array([0.9, 0.9], np.float32),
                       np.zeros(2, np.int64), m2, np.stack([e1, e3]), 1)
    assert ids1[0] == ids0[0]
    assert ids1[1] not in (-1, -2, ids0[0])


def test_qd_tracker_basic():
    rng = np.random.RandomState(2)
    e1 = rng.randn(16).astype(np.float32) * 5
    e2 = -e1
    tr = QuasiDenseTracker()
    boxes = np.array([[10, 10, 50, 50], [200, 200, 240, 240]], np.float32)
    keep, ids0 = tr.match(boxes, np.array([0.9, 0.8], np.float32),
                          np.array([0, 1], np.int64), np.stack([e1, e2]), 0)
    assert set(ids0.tolist()) == {0, 1}
    keep, ids1 = tr.match(boxes + 3, np.array([0.9, 0.8], np.float32),
                          np.array([0, 1], np.int64), np.stack([e1, e2]), 1)
    np.testing.assert_array_equal(np.sort(ids0), np.sort(ids1))
    # class gating: same embed but different label -> new track
    keep, ids2 = tr.match(boxes[:1], np.array([0.9], np.float32),
                          np.array([1], np.int64), e1[None], 2)
    assert ids2[0] == 2
