"""Pseudo-COCO scene-graph generation (tools/pseudo_coco.py) vs the
reference semantics (inference_on_custom_imgs_pseudo_coco.py:526-676):
class-gated +1-pixel IoU matching, both-ends GT gate, first-match id
assignment, the relationship_id advance-on-drop quirk, VG bbox format."""

import numpy as np

from rlipv2_tpu.tools.pseudo_coco import (
    coco_boxes_to_vg_objects,
    compute_iou_class_gated,
    filter_by_gt_objects,
    match_pred_to_gt,
)


def test_iou_class_gate_and_plus_one_convention():
    b = [0.0, 0.0, 9.0, 9.0]  # +1 convention: area 100
    assert compute_iou_class_gated(b, "dog", b, "cat") == 0.0
    assert compute_iou_class_gated(b, "dog", b, "dog") == 1.0
    # half-overlap along x: inter (5..9 -> 5 px wide) x 10 = 50; union 150
    b2 = [5.0, 0.0, 14.0, 9.0]
    assert abs(compute_iou_class_gated(b, "dog", b2, "dog") - 50 / 150) < 1e-9


def test_match_pred_to_gt_first_match_order():
    gt = np.asarray([[0, 0, 10, 10], [0, 0, 11, 11], [50, 50, 60, 60]], np.float32)
    pred = np.asarray([[0, 0, 10, 10], [52, 50, 60, 60]], np.float32)
    m = match_pred_to_gt(pred, ["dog", "cat"], gt, ["dog", "dog", "cat"])
    assert m[0] == [0, 1]  # both big-IoU dog GTs, gt order preserved
    assert m[1] == [2]


def test_filter_by_gt_objects_semantics():
    # 2 query pairs over 4 boxes; pair 0 matches GT on both ends, pair 1's
    # object has no GT match
    result = {
        "boxes": np.asarray(
            [[0, 0, 10, 10], [20, 20, 30, 30],     # pair-0 sub/obj
             [0, 0, 10, 10], [200, 200, 220, 220]],  # pair-1 sub/obj
            np.float32,
        ),
        "labels": np.asarray([0, 1, 0, 1]),
        "sub_ids": np.asarray([0, 2]),
        "obj_ids": np.asarray([1, 3]),
        # verbs: pair 0 has 2 above-threshold verbs, pair 1 has 1
        "verb_scores": np.asarray(
            [[0.9, 0.1, 0.0001], [0.5, 0.0001, 0.0001]], np.float32
        ),
    }
    gt_boxes = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_names = ["person", "dog"]

    entry = filter_by_gt_objects(
        result,
        object_names=["person", "dog"],
        rel_names=["holds", "pets", "rides"],
        gt_boxes=gt_boxes,
        gt_names=gt_names,
        image_id="1234",
    )
    assert entry["image_id"] == "1234"
    assert entry["dataset"] == "coco2017"
    # pair 1's object (far box) never matches GT -> only pair-0 triplets
    assert [r["predicate"] for r in entry["relationships"]] == ["holds", "pets"]
    assert all(
        r["subject_id"] == 0 and r["object_id"] == 1
        for r in entry["relationships"]
    )
    # relationship_id quirk: np.where walks row-major -> candidates are
    # (pair0,holds)=0, (pair0,pets)=1, (pair1,holds)=2; the dropped third
    # candidate still advanced nothing after it, so kept ids are 0 and 1
    assert [r["relationship_id"] for r in entry["relationships"]] == [0, 1]
    assert abs(entry["relationships"][0]["confidence"] - 0.9) < 1e-6

    # VG object conversion: xyxy -> x/y/w/h, names = GT names
    objs = entry["objects"]
    assert objs[0] == {
        "object_id": 0, "x": 0.0, "y": 0.0, "w": 10.0, "h": 10.0,
        "names": "person",
    }
    assert objs[1]["names"] == "dog"


def test_relationship_id_advances_on_dropped_candidates():
    # the FIRST candidate is dropped (object unmatched), the second kept:
    # its relationship_id must be 1, not 0 (reference quirk, :560-562)
    result = {
        "boxes": np.asarray(
            [[0, 0, 10, 10], [200, 200, 210, 210],
             [0, 0, 10, 10], [20, 20, 30, 30]], np.float32,
        ),
        "labels": np.asarray([0, 1, 0, 1]),
        "sub_ids": np.asarray([0, 2]),
        "obj_ids": np.asarray([1, 3]),
        "verb_scores": np.asarray([[0.9], [0.8]], np.float32),
    }
    gt_boxes = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    entry = filter_by_gt_objects(
        result, ["person", "dog"], ["holds"], gt_boxes, ["person", "dog"],
        image_id="7",
    )
    assert len(entry["relationships"]) == 1
    assert entry["relationships"][0]["relationship_id"] == 1


def test_vg_objects_roundtrip():
    objs = coco_boxes_to_vg_objects(
        np.asarray([[5, 6, 15, 26]], np.float32), ["cat"]
    )
    assert objs == [
        {"object_id": 0, "x": 5.0, "y": 6.0, "w": 10.0, "h": 20.0,
         "names": "cat"}
    ]
