import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.ops import (
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
)


def np_iou_giou(a, b):
    """Scalar-loop numpy oracle for IoU / GIoU."""
    n, m = len(a), len(b)
    iou = np.zeros((n, m))
    giou = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            ax0, ay0, ax1, ay1 = a[i]
            bx0, by0, bx1, by1 = b[j]
            iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
            ih = max(0.0, min(ay1, by1) - max(ay0, by0))
            inter = iw * ih
            union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
            iou[i, j] = inter / union
            hull = (max(ax1, bx1) - min(ax0, bx0)) * (max(ay1, by1) - min(ay0, by0))
            giou[i, j] = iou[i, j] - (hull - union) / hull
    return iou, giou


def rand_boxes(rng, n):
    xy = rng.uniform(0, 0.6, size=(n, 2))
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def test_roundtrip():
    rng = np.random.RandomState(0)
    b = rand_boxes(rng, 32)
    out = box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, atol=1e-6)


def test_iou_giou_vs_numpy_oracle():
    rng = np.random.RandomState(1)
    a, b = rand_boxes(rng, 17), rand_boxes(rng, 23)
    iou, _ = box_iou(jnp.asarray(a), jnp.asarray(b))
    giou = generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
    ref_iou, ref_giou = np_iou_giou(a, b)
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=1e-5)
    np.testing.assert_allclose(np.asarray(giou), ref_giou, atol=1e-5)


def test_batched_leading_dims():
    rng = np.random.RandomState(3)
    a = np.stack([rand_boxes(rng, 5) for _ in range(4)])
    b = np.stack([rand_boxes(rng, 7) for _ in range(4)])
    giou = generalized_box_iou(jnp.asarray(a), jnp.asarray(b))
    assert giou.shape == (4, 5, 7)
    for i in range(4):
        _, ref = np_iou_giou(a[i], b[i])
        np.testing.assert_allclose(np.asarray(giou[i]), ref, atol=1e-5)


def test_area():
    b = jnp.asarray([[0.0, 0.0, 2.0, 3.0]])
    assert float(box_area(b)[0]) == 6.0
