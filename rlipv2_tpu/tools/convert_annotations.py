"""Annotation-format converters — reproduce dataset preparation from raw
annotations.

Capability parity with the reference's offline converter suite (pure
functions here — paths are the caller's concern, no hardcoded /Path/To):
  * sample_percentage_annotations — HICO few-shot subsets: one image per
    verb first, then random fill, retried until all 117 verbs + 80
    objects are covered (reference:
    convert_annotations/convert_hico_annotations.py:11-96).
  * filter_zero_shot_annotations — drop unseen-HOI triplets for
    UC-RF / UC-NF / UO training (reference: :98-157; the unseen index
    lists live in rlipv2_tpu/data/hico.py UNSEEN_HOI_IDX, 0-based there,
    1-based in the trainval json).
  * hico_to_vg_format — HICO -> VG scene-graph-format for mixed
    pretraining (reference: :190-280).
  * oi_sgg_to_hico_format — Open Images v6 SGG -> HICO-format
    `rel_annotations` json (reference:
    convert_annotations/convert_OI_annotations.py:23-102).
  * oi_to_vg_format + keep_names_freq — OI -> VG format and the merged
    keep-names/frequency tables (reference:
    convert_annotations/merge_OI_with_VG.py:23-156).
  * sample_partial_vg_labels — random label-space subsets of VG
    (reference: convert_annotations/sample_partial_VG_labels.py:24-64).
  * vcoco_to_hoia — V-COCO vsrl annotations -> HOIA-format train/test
    jsons + the 29 verb classes (reference:
    convert_vcoco_annotations.py:37-167).
"""

from __future__ import annotations

import random
from collections import OrderedDict, defaultdict
from typing import Optional, Sequence

import numpy as np


# --------------------------- HICO converters --------------------------- #

def sample_percentage_annotations(
    annotations: Sequence[dict],
    percentage: int,
    n_verbs: int = 117,
    n_objs: int = 80,
    rng: Optional[random.Random] = None,
    max_retries: int = 1000,
) -> list[dict]:
    """Few-shot subset covering every verb and object class."""
    assert 0 < percentage <= 100
    rng = rng or random.Random(0)
    verb_images: dict[int, list[int]] = defaultdict(list)
    for idx, anno in enumerate(annotations):
        for r in anno["hoi_annotation"]:
            verb_images[r["category_id"]].append(idx)
    base = []
    for v_imgs in verb_images.values():
        pick = rng.sample(v_imgs, 1)[0]
        if pick not in base:
            base.append(pick)

    target = int(len(annotations) * percentage / 100.0)
    left = [i for i in range(len(annotations)) if i not in set(base)]
    n_fill = max(target - len(base), 0)
    for _ in range(max_retries):
        full = base + (rng.sample(left, min(n_fill, len(left))))
        verbs = {r["category_id"] for i in full for r in annotations[i]["hoi_annotation"]}
        objs = {o["category_id"] for i in full for o in annotations[i]["annotations"]}
        if len(verbs) >= min(n_verbs, len(verb_images)) and len(objs) >= min(
            n_objs, len({o["category_id"] for a in annotations for o in a["annotations"]})
        ):
            return [annotations[i] for i in full]
    raise RuntimeError("could not cover all classes within the budget")


def filter_zero_shot_annotations(
    annotations: Sequence[dict], setting: str
) -> list[dict]:
    """Remove unseen-HOI triplets (train-side zero-shot filtering).
    hoi_category_id in the trainval json is 1-based; the shared
    UNSEEN_HOI_IDX lists are 0-based (reference: :128-130 adds 1)."""
    from rlipv2_tpu.data.vocab import UNSEEN_HOI_IDX

    unseen = {u + 1 for u in UNSEEN_HOI_IDX[setting]}
    out = []
    for anno in annotations:
        a = dict(anno)
        a["hoi_annotation"] = [
            h for h in anno["hoi_annotation"]
            if h.get("hoi_category_id") not in unseen
        ]
        out.append(a)
    return out


def hico_to_vg_format(
    annotations: Sequence[dict],
    verb_id_to_name: dict,
    object_id_to_name: dict,
    start_id: int = 50_000_000,
) -> list[dict]:
    """HICO det annotations -> VG scene-graph format for mixed
    pretraining ('dataset': 'hico')."""
    object_id = rel_id = start_id
    out = []
    for anno in annotations:
        objects = []
        for obj in anno["annotations"]:
            x0, y0, x1, y1 = obj["bbox"]
            objects.append(
                {
                    "object_id": object_id,
                    "x": x0,
                    "y": y0,
                    "w": x1 - x0,
                    "h": y1 - y0,
                    "names": object_id_to_name[obj["category_id"]],
                }
            )
            object_id += 1
        rels = []
        for hoi in anno["hoi_annotation"]:
            rels.append(
                {
                    "relationship_id": rel_id,
                    "predicate": verb_id_to_name[hoi["category_id"]],
                    "subject_id": objects[hoi["subject_id"]]["object_id"],
                    "object_id": objects[hoi["object_id"]]["object_id"],
                }
            )
            rel_id += 1
        out.append(
            {
                "image_id": anno["file_name"],
                "dataset": "hico",
                "data_split": "train",
                "objects": objects,
                "relationships": rels,
            }
        )
    return out


# ---------------------------- OI converters ---------------------------- #

def oi_sgg_to_hico_format(annotations: Sequence[dict]) -> list[dict]:
    """OI v6 SGG annos ({img_fn, bbox, det_labels, rel}) -> HICO-format
    with `rel_annotations` (SGG fine-tuning json)."""
    out = []
    for anno in annotations:
        boxes = [
            {"bbox": b, "category_id": int(l)}
            for b, l in zip(anno["bbox"], anno["det_labels"])
        ]
        rels = [
            {"subject_id": int(r[0]), "object_id": int(r[1]),
             "category_id": int(r[2])}
            for r in anno["rel"]
        ]
        out.append(
            {
                "file_name": f"{anno['img_fn']}.jpg",
                "rel_annotations": rels,
                "annotations": boxes,
            }
        )
    return out


def oi_to_vg_format(
    annotations: Sequence[dict],
    obj_cat_names: Sequence[str],
    rel_cat_names: Sequence[str],
) -> list[dict]:
    """OI v6 SGG annos -> VG format for OI+VG merged pretraining."""
    object_id = rel_id = 0
    out = []
    for anno in annotations:
        boxes = []
        for b, l in zip(anno["bbox"], anno["det_labels"]):
            boxes.append(
                {
                    "object_id": object_id,
                    "x": b[0],
                    "y": b[1],
                    "w": b[2] - b[0],
                    "h": b[3] - b[1],
                    "names": obj_cat_names[int(l)],
                }
            )
            object_id += 1
        rels = []
        for r in anno["rel"]:
            rels.append(
                {
                    "relationship_id": rel_id,
                    "predicate": rel_cat_names[int(r[2])],
                    "subject_id": boxes[int(r[0])]["object_id"],
                    "object_id": boxes[int(r[1])]["object_id"],
                }
            )
            rel_id += 1
        out.append(
            {"image_id": anno["img_fn"], "objects": boxes,
             "relationships": rels}
        )
    return out


def keep_names_freq(
    annotations: Sequence[dict], min_freq: int = 0
) -> dict:
    """VG-format annotations -> the keep-names/frequency tables consumed
    by the datasets and negative-text sampling
    (vg_keep_names_*.json schema)."""
    rel_sum: OrderedDict = OrderedDict()
    obj_sum: OrderedDict = OrderedDict()
    for anno in annotations:
        for rel in anno["relationships"]:
            rel_sum[rel["predicate"]] = rel_sum.get(rel["predicate"], 0) + 1
        for obj in anno["objects"]:
            obj_sum[obj["names"]] = obj_sum.get(obj["names"], 0) + 1
    rel_sorted = sorted(rel_sum.items(), key=lambda kv: kv[1], reverse=True)
    obj_sorted = sorted(obj_sum.items(), key=lambda kv: kv[1], reverse=True)
    rel_keep = {k: v for k, v in rel_sorted if v >= min_freq}
    obj_keep = {k: v for k, v in obj_sorted if v >= min_freq}
    return {
        "relationship_names": list(rel_keep),
        "object_names": list(obj_keep),
        "relationship_freq": rel_keep,
        "object_freq": obj_keep,
    }


def sample_partial_vg_labels(
    annotations: Sequence[dict],
    relationship_names: Sequence[str],
    object_names: Sequence[str],
    ratio: float = 0.5,
    rng: Optional[random.Random] = None,
) -> list[dict]:
    """Random label-space subset: keep objects whose name is sampled and
    relations whose predicate AND endpoints survive."""
    rng = rng or random.Random(0)
    keep_rel = set(rng.sample(list(relationship_names),
                              int(len(relationship_names) * ratio)))
    keep_obj = set(rng.sample(list(object_names),
                              int(len(object_names) * ratio)))
    out = []
    for anno in annotations:
        objs = {o["object_id"]: o for o in anno["objects"]
                if o["names"] in keep_obj}
        rels = [
            r for r in anno["relationships"]
            if r["predicate"] in keep_rel
            and r["subject_id"] in objs and r["object_id"] in objs
        ]
        a = dict(anno)
        a["objects"] = list(objs.values())
        a["relationships"] = rels
        out.append(a)
    return out


# --------------------------- V-COCO converter -------------------------- #

def build_vcoco_verb_classes(vsrl_data: Sequence[dict]) -> list[str]:
    """26 actions -> 29 HOIA verb classes ('{action}' for role-less,
    '{action}_{role}' otherwise)."""
    verb_classes: list[str] = []
    for action in vsrl_data:
        if len(action["role_name"]) == 1:
            verb_classes.append(action["action_name"])
        else:
            verb_classes += [
                f"{action['action_name']}_{r}"
                for r in action["role_name"][1:]
            ]
    return verb_classes


def coco_box_annotations(coco_json: dict) -> dict:
    """Plain COCO json -> {img_id: {file_name, annotations,
    annotation_ids}} with xyxy boxes (reference: :78-133, sans
    pycocotools)."""
    box_annotations: dict = defaultdict(
        lambda: {"annotations": [], "annotation_ids": []}
    )
    for img in coco_json["images"]:
        box_annotations[img["id"]]["file_name"] = img["file_name"]
    for a in coco_json["annotations"]:
        box = np.asarray(a["bbox"], np.float64)
        box[2:] += box[:2]
        box_annotations[a["image_id"]]["annotations"].append(
            {"category_id": a["category_id"], "bbox": box.tolist()}
        )
        box_annotations[a["image_id"]]["annotation_ids"].append(a["id"])
    return box_annotations


def vcoco_to_hoia(
    box_annotations: dict,
    vsrl_data: Sequence[dict],
    verb_classes: Optional[Sequence[str]] = None,
) -> list[dict]:
    """vsrl annotation list -> HOIA-format annotations (the
    trainval_vcoco.json / test_vcoco.json schema). `vsrl_data` entries
    carry action_name, role_name, and Nx1 label/image_id plus NxK
    role_object_id arrays (reference set_hoi, :37-76). object_id == -1
    encodes 'no role object'."""
    verb_classes = verb_classes or build_vcoco_verb_classes(vsrl_data)
    no_object_id = -1
    out: dict = defaultdict(lambda: {"annotations": [], "hoi_annotation": []})
    for action in vsrl_data:
        labels = np.asarray(action["label"]).reshape(-1)
        image_ids = np.asarray(action["image_id"]).reshape(-1)
        role_ids = np.asarray(action["role_object_id"]).reshape(len(labels), -1)
        for label, img_id, roles in zip(labels, image_ids, role_ids):
            img_id = int(img_id)
            out[img_id]["file_name"] = box_annotations[img_id]["file_name"]
            out[img_id]["annotations"] = box_annotations[img_id]["annotations"]
            if label == 0:
                continue
            ann_ids = box_annotations[img_id]["annotation_ids"]
            subject_id = ann_ids.index(roles[0])
            if len(roles) == 1:
                out[img_id]["hoi_annotation"].append(
                    {
                        "subject_id": subject_id,
                        "object_id": no_object_id,
                        "category_id": verb_classes.index(
                            action["action_name"]
                        ),
                    }
                )
                continue
            for role_name, role_id in zip(action["role_name"][1:], roles[1:]):
                object_id = (
                    no_object_id if role_id == 0 else ann_ids.index(role_id)
                )
                out[img_id]["hoi_annotation"].append(
                    {
                        "subject_id": subject_id,
                        "object_id": object_id,
                        "category_id": verb_classes.index(
                            f"{action['action_name']}_{role_name}"
                        ),
                    }
                )
    return list(out.values())


# ---------------------- word-embedding extraction ----------------------- #

def extract_label_embeddings(
    texts: Sequence[str],
    encode_fn,
    batch_size: int = 1000,
) -> dict[str, np.ndarray]:
    """Label texts -> {text: pooled feature} via any
    encode_fn(list[str]) -> (N, D) (our RobertaModel.encode_text under
    jit, or an external SimCSE model). Reference:
    datasets/word_embedding/extract_vg_word_embeddings.py:82-150."""
    feats: dict[str, np.ndarray] = {}
    for start in range(0, len(texts), batch_size):
        chunk = list(texts[start : start + batch_size])
        emb = np.asarray(encode_fn(chunk))
        for t, e in zip(chunk, emb):
            feats[t] = e
    return feats


def save_label_embeddings_npz(
    path,
    relationship_names: Sequence[str],
    object_names: Sequence[str],
    encode_fn,
) -> None:
    """Write the rel_feature/obj_feature npz consumed by hard-negative
    text mining (data/text.py; reference loads the same schema at
    models/hoi.py:2209-2216 and engine.py:871-905)."""
    rel_feature = extract_label_embeddings(relationship_names, encode_fn)
    obj_feature = extract_label_embeddings(object_names, encode_fn)
    np.savez_compressed(
        path, rel_feature=rel_feature, obj_feature=obj_feature
    )
