"""vg_preprocess (raw scene_graphs.json corpus cleaning) vs the importable
reference pipeline (reference: datasets/vg.py:968-1190) on a canned mini
fixture: same cleaned relations, same keep-name tables."""

import copy
import importlib.util
import json
import sys

import numpy as np
import pytest

from rlipv2_tpu.tools.vg_preprocess import (
    iou_vg,
    load_alias_file,
    merge_label_with_alias,
    parse_alias_lines,
    vg_preprocess,
)

REF_VG = "/root/reference/datasets/vg.py"


def _obj(oid, name, x, y, w, h):
    return {
        "object_id": oid, "x": x, "y": y, "w": w, "h": h,
        "names": [name], "synsets": [],
    }


def _rel(rid, pred, sid, oid):
    return {
        "relationship_id": rid, "predicate": pred,
        "subject_id": sid, "object_id": oid, "synsets": [],
    }


def make_fixture():
    """Mini corpus exercising every executed step: case noise, exact
    duplicates, multi-name objects, IoU-redundant triplets (incl. via
    aliases), the per-image cap, and the global frequency filter."""
    rng = np.random.RandomState(0)
    graphs = []

    # image 1: duplicates + IoU redundancy + alias-mediated redundancy
    objs = [
        _obj(1, "Man", 10, 10, 50, 100),
        _obj(2, "Dog", 80, 40, 40, 30),
        _obj(3, "dogs", 82, 42, 40, 30),   # alias of dog, near-same box
        _obj(4, "frisbee", 200, 20, 25, 25),
        _obj(5, "man", 300, 10, 50, 100),  # far-away second man
    ]
    rels = [
        _rel(1, "Holds", 1, 2),
        _rel(2, "holds", 1, 2),        # exact duplicate (after lowering)
        _rel(3, "holding", 1, 3),      # alias predicate + alias object, high IoU
        _rel(4, "holds", 1, 4),        # different object class -> kept
        _rel(5, "holds", 5, 2),        # different subject box -> kept
        _rel(6, "rides", 1, 2),        # rare predicate -> freq-filtered
    ]
    graphs.append({"image_id": 1, "objects": objs, "relationships": rels})

    # image 2: relation-cap image (7 relations, cap at 5) with two objects
    objs2 = [_obj(10 + i, "man" if i % 2 == 0 else "dog",
                  10 * i, 5 * i, 30, 40) for i in range(8)]
    rels2 = [
        _rel(100 + i, "holds", 10 + (i % 4), 14 + (i % 3))
        for i in range(7)
    ]
    graphs.append({"image_id": 2, "objects": objs2, "relationships": rels2})

    # bulk images so 'man'/'dog'/'holds' clear the reference's hardcoded
    # >= 20 frequency threshold (datasets/vg.py:1124-1137)
    for k in range(20):
        o = [
            _obj(1000 + 2 * k, "man", 5, 5, 40, 80),
            _obj(1001 + 2 * k, "dog", 60, 30, 30, 25),
        ]
        r = [_rel(2000 + k, "holds", 1000 + 2 * k, 1001 + 2 * k)]
        graphs.append({"image_id": 100 + k, "objects": o, "relationships": r})
    del rng
    return graphs


ALIAS_OBJ = ["dog,dogs", "man,men"]
ALIAS_REL = ["holds,holding,hold"]


def _load_reference_vg():
    pytest.importorskip("torch")
    import ref_import

    ref_import.install_stubs()
    # vg.py's module imports pull in the reference `datasets` package
    # (-> pycocotools) and cv2; stub what this box lacks — the functions
    # under test (vg_preprocess + helpers) never touch them
    for name in ("pycocotools", "pycocotools.coco", "pycocotools.cocoeval",
                 "cv2", "h5py", "torchvision.transforms",
                 "torchvision.transforms.functional"):
        try:
            __import__(name)
        except ImportError:
            ref_import._stub(name)
    tv = sys.modules.get("torchvision")
    if tv is not None and not hasattr(tv, "datasets"):
        ds = ref_import._stub("torchvision.datasets")
        ds.CocoDetection = type("CocoDetection", (), {})
        tv.datasets = ds
    pct = sys.modules["pycocotools"]
    if not hasattr(pct, "mask"):
        pct.mask = ref_import._stub("pycocotools.mask")
        sys.modules["pycocotools.mask"] = pct.mask
    coco_mod = sys.modules.setdefault(
        "pycocotools.coco", ref_import._stub("pycocotools.coco")
    )
    if not hasattr(coco_mod, "COCO"):
        coco_mod.COCO = type("COCO", (), {})
    ev = sys.modules.setdefault(
        "pycocotools.cocoeval", ref_import._stub("pycocotools.cocoeval")
    )
    if not hasattr(ev, "COCOeval"):
        ev.COCOeval = type("COCOeval", (), {})
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location("ref_vg_mod", REF_VG)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_matches_reference_pipeline(tmp_path):
    ref = _load_reference_vg()

    # the reference's alias_dict hardcodes /Path/To/data — substitute the
    # same-format tables for the oracle run
    ref.alias_dict = lambda which: parse_alias_lines(
        ALIAS_REL if which == "relationship_alias" else ALIAS_OBJ
    )

    graphs = make_fixture()
    with open(tmp_path / "scene_graphs.json", "w") as f:
        json.dump(graphs, f)
    # reference signature: (dataset_path, IoU_thre, num_queries,
    # save_preprocess) — mutates + saves *_preprocess_greater20.json
    ref.vg_preprocess(str(tmp_path), IoU_thre=0.7, num_queries=5,
                      save_preprocess=True)
    with open(tmp_path / "scene_graphs_preprocess_greater20.json") as f:
        expected = json.load(f)

    # the reference's live frequency threshold is >= 20; our fixture needs
    # a smaller one, so shrink it for BOTH runs by running the reference
    # unfiltered... the reference hardcodes 20, so instead size the
    # fixture so the surviving names clear 20 via bulk images.
    ours, keep = vg_preprocess(
        make_fixture(), iou_thre=0.7, num_queries=5, min_freq=20,
        object_alias=parse_alias_lines(ALIAS_OBJ),
        relationship_alias=parse_alias_lines(ALIAS_REL),
    )
    assert ours == expected
    # keep tables follow the reference's documented format
    assert set(keep) == {"relationship_names", "object_names",
                         "relationship_freq", "object_freq"}


def test_steps_standalone():
    """Step-level expectations independent of the oracle."""
    graphs, keep = vg_preprocess(
        make_fixture(), iou_thre=0.7, num_queries=5, min_freq=2,
        object_alias=parse_alias_lines(ALIAS_OBJ),
        relationship_alias=parse_alias_lines(ALIAS_REL),
    )
    img1 = graphs[0]
    preds = [(r["relationship_id"]) for r in img1["relationships"]]
    # rel 2 exact-dup dropped; rel 3 alias+IoU-redundant dropped; rel 6
    # 'rides' and rel 4's 'frisbee' freq-filtered (count 1 < 2); 1, 5 stay
    assert preds == [1, 5]
    # names are lowercased strings now
    assert img1["objects"][0]["names"] == "man"
    # image 2 capped at 5 relations
    assert len(graphs[1]["relationships"]) <= 5
    assert "holds" in keep["relationship_freq"]
    assert keep["object_freq"]["man"] >= 2


def test_iou_vg_convention():
    # identical boxes -> 1; the +1 convention counts inclusive pixels
    assert iou_vg((0, 0, 9, 9), (0, 0, 9, 9)) == 1.0
    assert iou_vg((0, 0, 9, 9), (20, 20, 29, 29)) == 0.0
    v = iou_vg((0, 0, 9, 9), (0, 0, 19, 9))
    assert abs(v - 10 * 10 / (10 * 10 + 20 * 10 - 100)) < 1e-9


def test_merge_label_with_alias():
    graphs = [{
        "image_id": 1,
        "objects": [dict(_obj(1, "x", 0, 0, 1, 1), names="dogs")],
        "relationships": [_rel(1, "holding", 1, 1)],
    }]
    out = merge_label_with_alias(
        copy.deepcopy(graphs),
        parse_alias_lines(ALIAS_OBJ),
        parse_alias_lines(ALIAS_REL),
    )
    assert out[0]["objects"][0]["names"] == "dog"
    assert out[0]["relationships"][0]["predicate"] == "holds"
