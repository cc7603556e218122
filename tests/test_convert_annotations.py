"""Annotation converters vs reference semantics
(convert_annotations/*.py, convert_vcoco_annotations.py,
datasets/word_embedding/extract_vg_word_embeddings.py)."""

import random

import numpy as np

from rlipv2_tpu.tools.convert_annotations import (
    build_vcoco_verb_classes,
    coco_box_annotations,
    extract_label_embeddings,
    filter_zero_shot_annotations,
    hico_to_vg_format,
    keep_names_freq,
    oi_sgg_to_hico_format,
    oi_to_vg_format,
    sample_partial_vg_labels,
    sample_percentage_annotations,
    vcoco_to_hoia,
)


def synth_hico_annos(n=40, n_verbs=5, n_objs=4, seed=0):
    rng = random.Random(seed)
    annos = []
    for i in range(n):
        objs = [
            {"bbox": [0, 0, 10, 10], "category_id": 1},
            {"bbox": [5, 5, 20, 20], "category_id": rng.randrange(1, n_objs + 1)},
        ]
        hois = [
            {
                "subject_id": 0,
                "object_id": 1,
                "category_id": rng.randrange(1, n_verbs + 1),
                "hoi_category_id": rng.randrange(1, 21),
            }
        ]
        annos.append(
            {"file_name": f"HICO_train2015_{i:08d}.jpg",
             "annotations": objs, "hoi_annotation": hois}
        )
    return annos


def test_sample_percentage_covers_classes():
    annos = synth_hico_annos()
    verbs_all = {r["category_id"] for a in annos for r in a["hoi_annotation"]}
    objs_all = {o["category_id"] for a in annos for o in a["annotations"]}
    sub = sample_percentage_annotations(
        annos, 50, n_verbs=len(verbs_all), n_objs=len(objs_all),
        rng=random.Random(1),
    )
    assert len(sub) <= len(annos)
    verbs = {r["category_id"] for a in sub for r in a["hoi_annotation"]}
    objs = {o["category_id"] for a in sub for o in a["annotations"]}
    assert verbs == verbs_all and objs == objs_all


def test_zero_shot_filter_drops_unseen():
    from rlipv2_tpu.data.vocab import UNSEEN_HOI_IDX

    annos = synth_hico_annos()
    # pin one annotation to a known unseen id (+1 for the 1-based json)
    unseen_first = UNSEEN_HOI_IDX["UC-RF"][0] + 1
    annos[0]["hoi_annotation"][0]["hoi_category_id"] = unseen_first
    out = filter_zero_shot_annotations(annos, "UC-RF")
    assert len(out) == len(annos)
    assert out[0]["hoi_annotation"] == []
    assert annos[0]["hoi_annotation"]  # input untouched


def test_hico_to_vg_format():
    annos = synth_hico_annos(n=3)
    verb_names = {i: f"verb{i}" for i in range(1, 6)}
    obj_names = {i: f"obj{i}" for i in range(1, 5)}
    vg = hico_to_vg_format(annos, verb_names, obj_names)
    assert len(vg) == 3
    a = vg[0]
    assert a["dataset"] == "hico" and a["image_id"].endswith(".jpg")
    o = a["objects"][0]
    assert (o["x"], o["y"], o["w"], o["h"]) == (0, 0, 10, 10)  # xyxy -> xywh
    r = a["relationships"][0]
    assert r["subject_id"] == a["objects"][0]["object_id"]
    assert r["object_id"] == a["objects"][1]["object_id"]
    assert r["predicate"].startswith("verb")


def synth_oi(n=4, seed=3):
    rng = np.random.RandomState(seed)
    annos = []
    for i in range(n):
        annos.append(
            {
                "img_fn": f"img{i}",
                "bbox": rng.uniform(0, 50, (3, 4)).tolist(),
                "det_labels": [0, 1, 2],
                "rel": [[0, 1, 0], [1, 2, 1]],
            }
        )
    return annos


def test_oi_converters():
    annos = synth_oi()
    hico_form = oi_sgg_to_hico_format(annos)
    assert hico_form[0]["file_name"] == "img0.jpg"
    assert len(hico_form[0]["rel_annotations"]) == 2
    assert hico_form[0]["annotations"][0]["category_id"] == 0

    vg_form = oi_to_vg_format(annos, ["cat", "dog", "tree"], ["on", "near"])
    assert vg_form[0]["objects"][0]["names"] == "cat"
    assert vg_form[0]["relationships"][0]["predicate"] == "on"
    # global object ids: relation endpoints resolve across the whole list
    r = vg_form[1]["relationships"][0]
    ids = {o["object_id"] for o in vg_form[1]["objects"]}
    assert r["subject_id"] in ids and r["object_id"] in ids

    tables = keep_names_freq(vg_form)
    assert tables["object_freq"]["cat"] == 4
    assert tables["relationship_freq"]["on"] == 4
    assert tables["relationship_names"][0] in ("on", "near")


def test_sample_partial_vg_labels():
    vg_form = oi_to_vg_format(
        synth_oi(), ["cat", "dog", "tree"], ["on", "near"]
    )
    out = sample_partial_vg_labels(
        vg_form, ["on", "near"], ["cat", "dog", "tree"], ratio=0.67,
        rng=random.Random(0),
    )
    kept_names = {o["names"] for a in out for o in a["objects"]}
    assert 0 < len(kept_names) < 3
    for a in out:
        ids = {o["object_id"] for o in a["objects"]}
        for r in a["relationships"]:
            assert r["subject_id"] in ids and r["object_id"] in ids


def test_vcoco_to_hoia():
    coco_json = {
        "images": [{"id": 5, "file_name": "COCO_0005.jpg"}],
        "annotations": [
            {"id": 101, "image_id": 5, "category_id": 1, "bbox": [0, 0, 10, 20]},
            {"id": 102, "image_id": 5, "category_id": 40, "bbox": [5, 5, 10, 10]},
        ],
    }
    box_annos = coco_box_annotations(coco_json)
    assert box_annos[5]["annotations"][0]["bbox"] == [0, 0, 10, 20]
    vsrl = [
        {
            "action_name": "hold",
            "role_name": ["agent", "obj"],
            "label": [[1]],
            "image_id": [[5]],
            "role_object_id": [[101, 102]],
        },
        {
            "action_name": "smile",
            "role_name": ["agent"],
            "label": [[1]],
            "image_id": [[5]],
            "role_object_id": [[101]],
        },
        {
            "action_name": "cut",
            "role_name": ["agent", "instr"],
            "label": [[1]],
            "image_id": [[5]],
            "role_object_id": [[101, 0]],  # role absent -> object_id -1
        },
    ]
    verb_classes = build_vcoco_verb_classes(vsrl)
    assert verb_classes == ["hold_obj", "smile", "cut_instr"]
    hoia = vcoco_to_hoia(box_annos, vsrl, verb_classes)
    assert len(hoia) == 1
    hois = hoia[0]["hoi_annotation"]
    assert {"subject_id": 0, "object_id": 1, "category_id": 0} in hois
    assert {"subject_id": 0, "object_id": -1, "category_id": 1} in hois
    assert {"subject_id": 0, "object_id": -1, "category_id": 2} in hois


def test_extract_label_embeddings():
    rng = np.random.RandomState(0)

    def encode(texts):
        return rng.randn(len(texts), 8).astype(np.float32)

    feats = extract_label_embeddings(["on", "near", "cat"], encode, batch_size=2)
    assert set(feats) == {"on", "near", "cat"}
    assert feats["on"].shape == (8,)
