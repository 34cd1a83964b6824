"""NMS parity: vectorized fixpoint == sequential greedy reference."""
import jax.numpy as jnp
import numpy as np

from uninext_tpu.ops.nms import batched_nms


def greedy_reference(boxes, scores, classes, thr, valid):
    order = np.argsort(-np.where(valid, scores, -np.inf))
    keep = np.zeros(len(boxes), bool)
    kept = []
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in kept:
            if classes[i] != classes[j]:
                continue
            b1, b2 = boxes[i], boxes[j]
            lt = np.maximum(b1[:2], b2[:2])
            rb = np.minimum(b1[2:], b2[2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            if inter / max(a1 + a2 - inter, 1e-9) > thr:
                ok = False
                break
        if ok:
            keep[i] = True
            kept.append(i)
    return keep


def test_nms_matches_greedy_reference():
    rng = np.random.RandomState(0)
    for trial in range(8):
        N = 120
        xy = rng.rand(N, 2) * 100
        wh = rng.rand(N, 2) * 40 + 5
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(N).astype(np.float32)
        classes = rng.randint(0, 3, N)
        valid = rng.rand(N) > 0.1
        ref = greedy_reference(boxes, scores, classes, 0.5, valid)
        ours = np.asarray(batched_nms(jnp.array(boxes), jnp.array(scores),
                                      jnp.array(classes), 0.5,
                                      jnp.array(valid)))
        np.testing.assert_array_equal(ours, ref, err_msg=f"trial {trial}")


def test_nms_suppression_chain():
    # A(0.9) kills B(0.8); B would kill C(0.7); C must survive (greedy)
    boxes = np.array([[0, 0, 10, 10], [1, 0, 11, 10], [8, 0, 18, 10]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    classes = np.zeros(3, np.int64)
    keep = np.asarray(batched_nms(jnp.array(boxes), jnp.array(scores),
                                  jnp.array(classes), 0.5))
    # iou(A,B) high -> B dies; iou(A,C) low; iou(B,C) moderate but B is dead
    np.testing.assert_array_equal(keep, [True, False, True])
