"""Shared evaluator primitives: class-aware Pascal(+1) IoU and the
pred->gt match-pair tables used by the greedy TP/FP protocols
(reference: datasets/hico_eval.py:434-492, duplicated in
datasets/vcoco_eval.py and datasets/oi_sgg_eval.py)."""

from __future__ import annotations

import numpy as np


def compute_iou(bbox1: dict, bbox2: dict) -> float:
    """Zero unless category ids match; +1 Pascal-style areas."""
    if bbox1["category_id"] != bbox2["category_id"]:
        return 0.0
    r1, r2 = bbox1["bbox"], bbox2["bbox"]
    s1 = (r1[2] - r1[0] + 1) * (r1[3] - r1[1] + 1)
    s2 = (r2[2] - r2[0] + 1) * (r2[3] - r2[1] + 1)
    left = max(r1[1], r2[1])
    right = min(r1[3], r2[3])
    top = max(r1[0], r2[0])
    bottom = min(r1[2], r2[2])
    if left >= right or top >= bottom:
        return 0.0
    inter = (right - left + 1) * (bottom - top + 1)
    return inter / (s1 + s2 - inter)


def compute_iou_mat(bbox_list1, bbox_list2, overlap_iou: float = 0.5):
    """-> ({pred_id: [gt_ids]}, {pred_id: [overlaps]}) at IoU >= threshold.

    The matrix is produced by the native C++ core when available
    (rlipv2_tpu/native/eval_core.cpp pairwise_iou_cat) with a vectorized
    numpy fallback — both bit-match the scalar `compute_iou` protocol."""
    if len(bbox_list1) == 0 or len(bbox_list2) == 0:
        return {}, {}
    from rlipv2_tpu.native import pairwise_iou_cat

    b1 = np.asarray([b["bbox"] for b in bbox_list1], np.float64)
    b2 = np.asarray([b["bbox"] for b in bbox_list2], np.float64)
    # category ids may be composite (phrase categories are (sub, obj, rel)
    # tuples, oi_sgg_eval.py) — densify via a shared lookup so equality
    # semantics are preserved
    lut: dict = {}
    c1 = np.asarray(
        [lut.setdefault(b["category_id"], len(lut)) for b in bbox_list1],
        np.int32,
    )
    c2 = np.asarray(
        [lut.setdefault(b["category_id"], len(lut)) for b in bbox_list2],
        np.int32,
    )
    iou_mat = pairwise_iou_cat(b1, c1, b2, c2).astype(np.float64)
    iou_ov = iou_mat.copy()
    iou_mat = (iou_mat >= overlap_iou).astype(np.float64)

    match_pairs = np.nonzero(iou_mat)
    match_pairs_dict: dict = {}
    match_pair_overlaps: dict = {}
    if iou_mat.max() > 0:
        for i, pred_id in enumerate(match_pairs[1]):
            match_pairs_dict.setdefault(pred_id, []).append(match_pairs[0][i])
            match_pair_overlaps.setdefault(pred_id, []).append(
                iou_ov[match_pairs[0][i], pred_id]
            )
    return match_pairs_dict, match_pair_overlaps
