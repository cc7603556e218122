"""Native C++ evaluator core vs the python/numpy protocol: exact parity
on randomized boxes (double precision both sides)."""

import numpy as np

import rlipv2_tpu.native as native


def _rand_boxes(rng, n):
    xy = rng.rand(n, 2) * 80
    wh = rng.rand(n, 2) * 40 + 1
    return np.concatenate([xy, xy + wh], axis=1)


def test_native_builds():
    assert native.native_available(), "g++ toolchain present but build failed"


def test_pairwise_iou_parity():
    from rlipv2_tpu.eval.common import compute_iou

    rng = np.random.RandomState(0)
    b1 = _rand_boxes(rng, 23)
    b2 = _rand_boxes(rng, 17)
    c1 = rng.randint(0, 4, 23)
    c2 = rng.randint(0, 4, 17)
    mat = native.pairwise_iou_cat(b1, c1, b2, c2)
    for i in range(23):
        for j in range(17):
            ref = compute_iou(
                {"bbox": b1[i], "category_id": int(c1[i])},
                {"bbox": b2[j], "category_id": int(c2[j])},
            )
            assert abs(mat[i, j] - ref) < 1e-12, (i, j)


def test_pairwise_nms_parity():
    from rlipv2_tpu.eval.hico_eval import HICOEvaluator

    rng = np.random.RandomState(1)
    n = 40
    subs = _rand_boxes(rng, n)
    objs = _rand_boxes(rng, n)
    # overlapping clusters so NMS actually suppresses
    subs[n // 2 :] = subs[: n // 2] + rng.randn(n // 2, 4) * 2
    objs[n // 2 :] = objs[: n // 2] + rng.randn(n // 2, 4) * 2
    scores = rng.rand(n)

    ev = HICOEvaluator.__new__(HICOEvaluator)
    ev.nms_alpha, ev.nms_beta, ev.thres_nms = 1.0, 0.5, 0.5

    got = ev.pairwise_nms(subs, objs, scores)

    # force the numpy fallback by monkeypatching the native loader
    import rlipv2_tpu.native as nat

    lib, nat._lib, nat._tried = nat._lib, None, True
    try:
        want = ev.pairwise_nms(subs, objs, scores)
    finally:
        nat._lib, nat._tried = lib, True
    assert list(got) == list(want)
