"""Panoptic Quality (PQ) evaluator — self-contained numpy implementation
of the official panopticapi metric consumed by the reference's
CocoPanopticEvaluator (reference: datasets/coco_eval.py / panopticapi;
the reference shells out to panopticapi.pq_compute on PNG payloads — we
evaluate the id maps directly, zero-egress and pycocotools-free).

Semantics (Kirillov et al., Panoptic Segmentation, CVPR 2019):
  * a predicted and a GT segment of the SAME category match iff
    IoU > 0.5 (matches are unique by construction);
  * PQ = sum(IoU of matches) / (|TP| + |FP|/2 + |FN|/2), SQ = mean IoU of
    matches, RQ = TP / (TP + FP/2 + FN/2), reported per category and
    averaged over categories present in the GT;
  * pixels with GT id 0 are VOID: predicted segments whose area is > 50%
    VOID (outside any GT segment) are removed from the FP count.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def _segment_areas(ids, infos):
    return {s["id"]: int((ids == s["id"]).sum()) for s in infos}


def pq_compute_single(gt_ids, gt_info, pred_ids, pred_info):
    """Accumulate match statistics for ONE image.

    gt_ids/pred_ids: (H, W) int arrays, 0 = void/unassigned.
    gt_info/pred_info: lists of {id, category_id, ...}.
    Returns dict cat -> dict(iou=…, tp=…, fp=…, fn=…).
    """
    gt_cat = {s["id"]: s["category_id"] for s in gt_info}
    pred_cat = {s["id"]: s["category_id"] for s in pred_info}
    gt_areas = _segment_areas(gt_ids, gt_info)
    pred_areas = _segment_areas(pred_ids, pred_info)

    # joint histogram over (gt_id, pred_id) via a single 64-bit key pass
    offset = 1 << 32
    combined = gt_ids.astype(np.int64) * offset + pred_ids.astype(np.int64)
    keys, counts = np.unique(combined, return_counts=True)
    inter = {}
    for k, cnt in zip(keys, counts):
        gid, pid = int(k // offset), int(k % offset)
        inter[(gid, pid)] = int(cnt)

    stats = defaultdict(lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
    matched_gt, matched_pred = set(), set()
    for (gid, pid), cnt in inter.items():
        if gid == 0 or pid == 0:
            continue
        if gt_cat.get(gid) != pred_cat.get(pid):
            continue
        union = gt_areas[gid] + pred_areas[pid] - cnt
        iou = cnt / union if union else 0.0
        if iou > 0.5:
            cat = gt_cat[gid]
            stats[cat]["tp"] += 1
            stats[cat]["iou"] += iou
            matched_gt.add(gid)
            matched_pred.add(pid)

    for s in gt_info:
        if s["id"] not in matched_gt:
            stats[s["category_id"]]["fn"] += 1
    void_overlap = {
        pid: inter.get((0, pid), 0) for pid in pred_areas
    }
    for s in pred_info:
        pid = s["id"]
        if pid in matched_pred:
            continue
        # official VOID rule: ignore predictions mostly outside the GT
        if pred_areas[pid] and void_overlap.get(pid, 0) / pred_areas[pid] > 0.5:
            continue
        stats[s["category_id"]]["fp"] += 1
    return stats


class PanopticEvaluator:
    """Accumulates per-image stats; summarize() returns PQ/SQ/RQ."""

    def __init__(self):
        self._stats = defaultdict(
            lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0}
        )

    def update(self, gt_ids, gt_info, pred_ids, pred_info):
        for cat, s in pq_compute_single(
            gt_ids, gt_info, pred_ids, pred_info
        ).items():
            agg = self._stats[cat]
            for k in ("tp", "fp", "fn"):
                agg[k] += s[k]
            agg["iou"] += s["iou"]

    def summarize(self):
        per_cat = {}
        pqs, sqs, rqs = [], [], []
        for cat, s in sorted(self._stats.items()):
            denom = s["tp"] + 0.5 * s["fp"] + 0.5 * s["fn"]
            if denom == 0:
                continue
            pq = s["iou"] / denom
            sq = s["iou"] / s["tp"] if s["tp"] else 0.0
            rq = s["tp"] / denom
            per_cat[cat] = {"pq": pq, "sq": sq, "rq": rq}
            pqs.append(pq)
            sqs.append(sq)
            rqs.append(rq)
        n = max(len(pqs), 1)
        return {
            "PQ": sum(pqs) / n,
            "SQ": sum(sqs) / n,
            "RQ": sum(rqs) / n,
            "per_class": per_cat,
            "n_classes": len(pqs),
        }
