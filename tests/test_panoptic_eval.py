"""Panoptic Quality evaluator: hand-checkable cases (perfect match,
category mismatch, IoU threshold, VOID rule, FP/FN accounting)."""

import numpy as np

from rlipv2_tpu.eval.panoptic_eval import PanopticEvaluator, pq_compute_single


def make_map(boxes):
    """boxes: list of (id, y0, y1, x0, x1) painted in order on a 20x30 map."""
    m = np.zeros((20, 30), np.int32)
    for sid, y0, y1, x0, x1 in boxes:
        m[y0:y1, x0:x1] = sid
    return m


def test_perfect_match():
    gt = make_map([(1, 0, 10, 0, 10), (2, 10, 20, 10, 30)])
    info = [{"id": 1, "category_id": 5}, {"id": 2, "category_id": 7}]
    ev = PanopticEvaluator()
    ev.update(gt, info, gt.copy(), [dict(i) for i in info])
    s = ev.summarize()
    assert abs(s["PQ"] - 1.0) < 1e-9
    assert abs(s["SQ"] - 1.0) < 1e-9
    assert abs(s["RQ"] - 1.0) < 1e-9
    assert s["n_classes"] == 2


def test_category_mismatch_is_fp_and_fn():
    gt = make_map([(1, 0, 10, 0, 10)])
    pred = make_map([(1, 0, 10, 0, 10)])
    stats = pq_compute_single(
        gt, [{"id": 1, "category_id": 5}],
        pred, [{"id": 1, "category_id": 6}],
    )
    assert stats[5]["fn"] == 1 and stats[6]["fp"] == 1
    assert stats[5]["tp"] == 0 and stats[6]["tp"] == 0


def test_iou_threshold():
    gt = make_map([(1, 0, 10, 0, 10)])  # area 100
    # overlap 50, pred area 100 -> IoU = 50/150 = 0.33 -> no match
    pred_low = make_map([(1, 5, 15, 0, 10)])
    info5 = [{"id": 1, "category_id": 5}]
    s = pq_compute_single(gt, info5, pred_low, [dict(i) for i in info5])
    assert s[5]["tp"] == 0 and s[5]["fn"] == 1 and s[5]["fp"] == 1
    # overlap 80 -> IoU = 80/120 = 0.67 -> match
    pred_hi = make_map([(1, 2, 12, 0, 10)])
    s = pq_compute_single(gt, info5, pred_hi, [dict(i) for i in info5])
    assert s[5]["tp"] == 1 and s[5]["fn"] == 0 and s[5]["fp"] == 0
    assert abs(s[5]["iou"] - 80 / 120) < 1e-9


def test_void_rule():
    """A prediction mostly over VOID pixels is not counted as FP."""
    gt = make_map([(1, 0, 10, 0, 10)])  # rest of the map is void (0)
    pred = make_map([(2, 12, 20, 12, 30)])  # entirely in void
    s = pq_compute_single(
        gt, [{"id": 1, "category_id": 5}],
        pred, [{"id": 2, "category_id": 5}],
    )
    assert s[5]["fp"] == 0 and s[5]["fn"] == 1


def test_pq_value():
    """One TP (IoU 0.8), one FN, one FP in the same class:
    PQ = 0.8 / (1 + 0.5 + 0.5) = 0.4."""
    gt = make_map([(1, 0, 10, 0, 10), (2, 10, 20, 0, 10)])
    ginfo = [{"id": 1, "category_id": 3}, {"id": 2, "category_id": 3}]
    # pred 1 overlaps gt1 with IoU 80/120; pred 9 sits on gt2's area with
    # IoU 0.5 (not > 0.5, so unmatched -> FP; gt2 -> FN)
    pred = make_map([(1, 2, 12, 0, 10), (9, 15, 20, 0, 10)])
    pinfo = [{"id": 1, "category_id": 3}, {"id": 9, "category_id": 3}]
    ev = PanopticEvaluator()
    ev.update(gt, ginfo, pred, pinfo)
    s = ev.summarize()
    iou = 80 / 120
    assert abs(s["PQ"] - iou / 2.0) < 1e-9
    assert abs(s["RQ"] - 0.5) < 1e-9
