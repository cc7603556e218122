"""Pseudo-COCO scene-graph generation on custom images.

Capability parity with the reference's
`inference_on_custom_imgs_pseudo_coco.py` (925 LoC): run an RLIP model
over COCO-annotated images with a per-image candidate-relation vocabulary,
keep predicted triplets whose subject AND object IoU-match (same class,
IoU >= 0.5, +1-pixel convention) a ground-truth COCO box, remap them onto
the GT object ids, and emit VG-format scene-graph entries
(`{"image_id", "objects": [...x/y/w/h/names], "relationships":
[...predicate/subject_id/object_id/confidence], "dataset": "coco2017"}`)
that the VG pretraining loader consumes directly.

Reference contracts:
  * filter_by_gt_object_annotations
    (/root/reference/inference_on_custom_imgs_pseudo_coco.py:526-573):
    verb_thre=0.005; triplet kept iff both ends have >= 1 GT match; the
    FIRST matching GT id is assigned; relationship_id counts every
    above-threshold candidate (kept or not — quirk preserved).
  * compute_iou_mat / compute_IOU (:619-676): class-equality gate, +1
    pixel area convention, overlap 0.5.
  * transform_coco_bbox_to_VG_format (:591-613): xyxy -> x/y/w/h with
    names = category name.
"""

from __future__ import annotations

import argparse
import json
from typing import Optional, Sequence

import numpy as np

VERB_THRESHOLD = 0.005
OVERLAP_IOU = 0.5


def compute_iou_class_gated(box1, cat1, box2, cat2) -> float:
    """Reference compute_IOU: zero unless categories match; +1 pixel
    convention on xyxy boxes."""
    if cat1 != cat2:
        return 0.0
    s1 = (box1[2] - box1[0] + 1) * (box1[3] - box1[1] + 1)
    s2 = (box2[2] - box2[0] + 1) * (box2[3] - box2[1] + 1)
    left = max(box1[1], box2[1])
    right = min(box1[3], box2[3])
    top = max(box1[0], box2[0])
    bottom = min(box1[2], box2[2])
    if left >= right or top >= bottom:
        return 0.0
    inter = (right - left + 1) * (bottom - top + 1)
    return float(inter / (s1 + s2 - inter))


def match_pred_to_gt(
    pred_boxes, pred_cats, gt_boxes, gt_cats, overlap_iou: float = OVERLAP_IOU
) -> dict:
    """{pred_id: [gt ids with same class and IoU >= overlap]} — the
    reference's match_pairs dict transposed onto prediction ids
    (reference :505-516)."""
    matches: dict = {i: [] for i in range(len(pred_boxes))}
    for g, (gb, gc) in enumerate(zip(gt_boxes, gt_cats)):
        for p, (pb, pc) in enumerate(zip(pred_boxes, pred_cats)):
            if compute_iou_class_gated(gb, gc, pb, pc) >= overlap_iou:
                matches[p].append(g)
    return matches


def coco_boxes_to_vg_objects(gt_boxes, gt_names) -> list:
    """xyxy GT boxes -> VG `objects` entries (reference :591-613)."""
    return [
        {
            "object_id": i,
            "x": float(b[0]),
            "y": float(b[1]),
            "w": float(b[2] - b[0]),
            "h": float(b[3] - b[1]),
            "names": n,
        }
        for i, (b, n) in enumerate(zip(gt_boxes, gt_names))
    ]


def filter_by_gt_objects(
    result: dict,  # labels (2nq,), boxes (2nq,4), verb_scores (nq,V),
    #                sub_ids (nq,), obj_ids (nq,)
    object_names: Sequence[str],  # prediction label id -> name
    rel_names: Sequence[str],  # verb column -> predicate name
    gt_boxes,  # (m, 4) xyxy
    gt_names: Sequence[str],
    image_id: str,
    verb_thre: float = VERB_THRESHOLD,
    dataset: str = "coco2017",
    data_split: str = "train2017",
) -> dict:
    """One image's predictions -> one VG-format scene-graph entry
    (reference filter_by_gt_object_annotations :526-573)."""
    boxes = np.asarray(result["boxes"], np.float32)
    labels = np.asarray(result["labels"])
    vs = np.asarray(result["verb_scores"], np.float32)
    sub_ids = np.asarray(result["sub_ids"])
    obj_ids = np.asarray(result["obj_ids"])

    pred_cats = [object_names[int(l)] for l in labels]
    matches = match_pred_to_gt(boxes, pred_cats, gt_boxes, list(gt_names))

    rels = []
    relationship_id = 0
    pair_idx, rel_idx = np.where(vs >= verb_thre)
    for q, v in zip(pair_idx, rel_idx):
        s, o = int(sub_ids[q]), int(obj_ids[q])
        if matches[s] and matches[o]:
            rels.append(
                {
                    "relationship_id": relationship_id,
                    "predicate": rel_names[int(v)],
                    "subject_id": int(matches[s][0]),
                    "object_id": int(matches[o][0]),
                    "confidence": float(vs[q, v]),
                }
            )
        # reference quirk: the counter advances for EVERY above-threshold
        # candidate, kept or dropped
        relationship_id += 1

    return {
        "image_id": str(image_id),
        "objects": coco_boxes_to_vg_objects(gt_boxes, gt_names),
        "relationships": rels,
        "dataset": dataset,
        "data_split": data_split,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--coco_anno", required=True,
                   help="json {image_id: {boxes xyxy, labels names}} GT "
                        "object annotations")
    p.add_argument("--rels", required=True,
                   help="json {image_id: [candidate predicate, ...]}")
    p.add_argument("--checkpoint", required=True,
                   help="RLIP-ParSeDA torch .pth (converted on load)")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--out", required=True)
    p.add_argument("--verb_thre", type=float, default=VERB_THRESHOLD)
    args = p.parse_args(argv)

    from PIL import Image

    from rlipv2_tpu.data.vocab import HICO_OBJECT_NAMES
    from rlipv2_tpu.tools.golden_check import (
        convert_checkpoint,
        default_config,
        load_torch_state_dict,
        preprocess_images,
        run_detections,
    )
    from rlipv2_tpu.data.text import HFTextEncoder

    with open(args.coco_anno) as f:
        coco = json.load(f)
    with open(args.rels) as f:
        rels_for_img = json.load(f)

    object_names = list(HICO_OBJECT_NAMES)
    all_rels = sorted({r for rs in rels_for_img.values() for r in rs})

    cfg = default_config(args.backbone, n_obj=len(object_names) + 1,
                         n_verb=len(all_rels))
    sd = load_torch_state_dict(args.checkpoint)
    params = convert_checkpoint(sd, cfg)

    enc = HFTextEncoder()
    feats = enc(object_names + ["no objects"] + all_rels)

    entries = []
    for path in args.images:
        img = np.asarray(Image.open(path).convert("RGB"))
        image_id = path.rsplit("/", 1)[-1].split(".")[0].lstrip("0") or "0"
        if image_id not in rels_for_img or not rels_for_img[image_id]:
            continue
        pixels, valid, sizes = preprocess_images([img])
        results = run_detections(
            params, cfg, pixels, valid, sizes, np.asarray(feats)
        )
        gt = coco[image_id]
        entries.append(
            filter_by_gt_objects(
                results[0], object_names, all_rels,
                np.asarray(gt["boxes"], np.float32), gt["labels"],
                image_id, verb_thre=args.verb_thre,
            )
        )

    with open(args.out, "w") as f:
        json.dump(entries, f)
    print(f"wrote {args.out} ({len(entries)} images)")


if __name__ == "__main__":
    main()
