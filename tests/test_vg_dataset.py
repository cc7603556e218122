"""VG-format dataset, filters, concat, and the batch-iterative sampler."""

import json

import numpy as np
import pytest

from rlipv2_tpu.data.transforms import HOITransform
from rlipv2_tpu.data.vg import (
    ConcatRelDataset,
    VGRelDataset,
    batch_iterative_indices,
    generate_keep_names_freq,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def make_vg(tmp_path, n=4, dataset_field=None, confidences=False):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    annos = []
    for i in range(n):
        img_id = 1000 + i
        Image.fromarray((rng.rand(120, 160, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{img_id}.jpg"
        )
        objs = [
            {"object_id": 1, "x": 10, "y": 10, "w": 40, "h": 40, "names": "man"},
            {"object_id": 2, "x": 30, "y": 30, "w": 50, "h": 40, "names": "horse"},
            {"object_id": 3, "x": 100, "y": 10, "w": 30, "h": 30, "names": "tree"},
        ]
        rels = [
            {"subject_id": 1, "object_id": 2, "predicate": "rides"},
            {"subject_id": 1, "object_id": 2, "predicate": "pets"},
            {"subject_id": 1, "object_id": 3, "predicate": "near"},
        ]
        if confidences:
            rels[2]["confidence"] = 0.1  # below threshold
        a = {"image_id": img_id, "objects": objs, "relationships": rels}
        if dataset_field:
            a["dataset"] = dataset_field
        annos.append(a)
    anno_file = tmp_path / "annos.json"
    anno_file.write_text(json.dumps(annos))
    return anno_file, img_dir


def test_vg_targets(tmp_path):
    anno_file, img_dir = make_vg(tmp_path)
    ds = VGRelDataset(
        anno_file, {"vg": img_dir}, transforms=HOITransform(train=False, val_size=96)
    )
    img, t = ds[0]
    # per-image label space
    assert t["obj_classes"] == ["man", "horse", "tree"]
    assert t["verb_classes"] == ["rides", "pets", "near"]
    # (1,2) pair merged into one row with two verbs
    assert t["verb_labels"].shape == (2, 3)
    assert t["verb_labels"][0].sum() == 2
    assert t["sub_labels"][0] == 0 and t["obj_labels"][0] == 1
    assert t["obj_labels"][1] == 2


def test_relation_threshold(tmp_path):
    anno_file, img_dir = make_vg(tmp_path, confidences=True)
    ds = VGRelDataset(
        anno_file,
        {"vg": img_dir},
        transforms=HOITransform(train=False, val_size=96),
        relation_threshold=0.2,
    )
    _, t = ds[0]
    assert "near" not in t["verb_classes"]  # confidence 0.1 < 0.2 dropped


def test_pair_overlap_filter(tmp_path):
    anno_file, img_dir = make_vg(tmp_path)
    ds = VGRelDataset(
        anno_file,
        {"vg": img_dir},
        transforms=HOITransform(train=False, val_size=96),
        pair_overlap=True,
    )
    _, t = ds[0]
    # (1,3) boxes don't overlap -> 'near' filtered; (1,2) overlap kept
    assert t["verb_classes"] == ["rides", "pets"]


def test_concat_and_freq(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    f1, d1 = make_vg(tmp_path / "a")
    f2, d2 = make_vg(tmp_path / "b")
    ds1 = VGRelDataset(f1, {"vg": d1}, transforms=HOITransform(train=False, val_size=96))
    ds2 = VGRelDataset(f2, {"vg": d2}, transforms=HOITransform(train=False, val_size=96))
    cat = ConcatRelDataset([ds1, ds2])
    assert len(cat) == len(ds1) + len(ds2)
    assert cat.object_freq["man"] == ds1.object_freq["man"] + ds2.object_freq["man"]
    _, t = cat[len(ds1)]  # first item of ds2
    assert t["obj_classes"][0] == "man"


def test_batch_iterative_indices():
    sizes = [10, 6, 4]
    batches = batch_iterative_indices(
        sizes, batch_size=2, iterative_paradigm=[0, 1, 2],
        num_replicas=2, rank=0, shuffle=False,
    )
    # anchor 10 / replicas 2 = 5 samples -> ceil(5/2) = 3 rounds x 3 datasets
    assert len(batches) == 9
    # batches alternate datasets: 0 from [0,10), 1 from [10,16), 2 from [16,20)
    assert all(i < 10 for i in batches[0])
    assert all(10 <= i < 16 for i in batches[1])
    assert all(16 <= i < 20 for i in batches[2])
    # rank subsampling: rank 0 takes even strided positions
    r1 = batch_iterative_indices(
        sizes, 2, [0, 1, 2], num_replicas=2, rank=1, shuffle=False
    )
    assert set(batches[0]).isdisjoint(r1[0])


def test_generate_keep_names_freq():
    annos = [
        {
            "objects": [{"names": "a"}, {"names": "b"}, {"names": "a"}],
            "relationships": [{"predicate": "x"}],
        }
    ]
    t = generate_keep_names_freq(annos)
    assert t["object_freq"] == {"a": 2, "b": 1}
    assert t["relationship_names"] == ["x"]


def test_vcoco_no_object_pairs(tmp_path):
    """V-COCO: object_id -1 -> no-object class (80) + zero obj box."""
    import json as _json

    from rlipv2_tpu.data.vcoco import VCOCODataset

    img_dir = tmp_path / "vcimgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(100, 100, 3) * 255).astype(np.uint8)).save(
        img_dir / "x.jpg"
    )
    annos = [
        {
            "file_name": "x.jpg",
            "annotations": [{"bbox": [5, 5, 60, 60], "category_id": 1}],
            "hoi_annotation": [
                {"subject_id": 0, "object_id": -1, "category_id": 1},  # stand
            ],
        }
    ]
    af = tmp_path / "vc.json"
    af.write_text(_json.dumps(annos))
    ds = VCOCODataset(
        "train", img_dir, af, transforms=HOITransform(train=False, val_size=64)
    )
    _, t = ds[0]
    assert t["obj_labels"][0] == 80  # no-object class
    assert (t["obj_boxes"][0] == 0).all()
    assert t["verb_labels"].shape[1] == 29
