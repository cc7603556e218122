"""End-to-end pseudo-label drill from RAW COCO-format json (the headline
"fast scaling" capability, SURVEY §2.7): caption -> scene graph ->
tagger candidates -> CocoRelDataset -> R-Tagger inference -> VG-format
pseudo annotations -> VGRelDataset consumption with thresholding.

Reference chain: datasets/rlipv2_helper/BLIP_coco_caption_helper.py ->
datasets/coco.py:241-287 CocoRelDetection ->
generate_relations_using_verb_tagger.py -> datasets/mixed_dataset.py."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.data.coco import CocoDetectionDataset, CocoRelDataset
from rlipv2_tpu.engine.loops import CachedTextEncoder
from rlipv2_tpu.models.parseda import RLIPParSeDA
from rlipv2_tpu.structures import HOITargets
from rlipv2_tpu.tools.caption_to_sg import (
    build_tagger_candidates,
    match_graph_to_box_names,
    parse_caption,
)
from rlipv2_tpu.tools.generate_relations import generate_pseudo_annotations
from test_parseda_forward import tiny_config

PIL = pytest.importorskip("PIL")


@pytest.fixture()
def coco_fixture(tmp_path):
    """Raw COCO-format detection json + images + captions."""
    from PIL import Image

    img_dir = tmp_path / "train2017"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    captions = {}
    aid = 0
    for i, image_id in enumerate([7, 11, 13]):
        fn = f"{image_id:012d}.jpg"
        Image.fromarray(
            (rng.rand(80, 96, 3) * 255).astype(np.uint8)
        ).save(img_dir / fn)
        images.append({"id": image_id, "file_name": fn, "height": 80, "width": 96})
        # two objects per image: a person and a horse (category ids 1, 19)
        for cat, box in [(1, [5, 5, 30, 50]), (19, [40, 10, 50, 60])]:
            annotations.append(
                {
                    "id": aid,
                    "image_id": image_id,
                    "category_id": cat,
                    "bbox": box,
                    "iscrowd": 0,
                    "area": box[2] * box[3],
                }
            )
            aid += 1
        # a degenerate + crowd annotation that must be dropped
        annotations.append(
            {"id": aid, "image_id": image_id, "category_id": 1,
             "bbox": [10, 10, 0, 5], "iscrowd": 0, "area": 0}
        )
        aid += 1
        annotations.append(
            {"id": aid, "image_id": image_id, "category_id": 19,
             "bbox": [1, 1, 10, 10], "iscrowd": 1, "area": 100}
        )
        aid += 1
        captions[image_id] = "a person riding a horse"
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}, {"id": 19, "name": "horse"}],
    }
    ann_file = tmp_path / "instances.json"
    ann_file.write_text(json.dumps(ann))
    return img_dir, ann_file, captions


def test_coco_detection_reader(coco_fixture):
    img_dir, ann_file, _ = coco_fixture
    ds = CocoDetectionDataset(img_dir, ann_file)
    assert len(ds) == 3
    assert ds.object_names == ["person", "horse"]
    img, tgt = ds[0]
    assert img.shape == (80, 96, 3)
    # crowd + degenerate dropped, category ids remapped to contiguous
    assert tgt["boxes"].shape == (2, 4)
    assert tgt["labels"].tolist() == [0, 1]
    assert tgt["boxes"][0].tolist() == [5, 5, 35, 55]  # xywh -> xyxy


def test_full_pseudo_label_chain(coco_fixture, tmp_path):
    img_dir, ann_file, captions = coco_fixture

    # 1. captions -> scene graphs -> candidates keyed by image id
    ds_plain = CocoDetectionDataset(img_dir, ann_file)
    img_rels = {}
    for image_id, caption in captions.items():
        graph = parse_caption(caption)
        matched = match_graph_to_box_names(graph, ds_plain.object_names)
        assert matched["relations"], "caption parser found no relations"
        cands = build_tagger_candidates([matched], ds_plain.object_names)
        img_rels[str(image_id)] = [
            [list(map(list, pairs)), rels] for pairs, rels in cands
        ]
    cand_file = tmp_path / "vg_rel_texts_for_coco_images.json"
    cand_file.write_text(json.dumps(img_rels))

    # 2. tagger-input dataset over the raw COCO json + candidates
    from rlipv2_tpu.data.transforms import HOITransform

    rel_ds = CocoRelDataset(
        img_dir, ann_file, cand_file,
        transforms=HOITransform(train=False, val_size=64, max_size=96),
    )
    assert len(rel_ds) == 3
    img, tgt = rel_ds[0]
    pairs, rels = tgt["relation_candidates"][0]
    assert rels == ["riding"] and (0, 1) in pairs

    # 3. R-Tagger inference -> VG-format pseudo annotations
    cfg = dataclasses.replace(tiny_config(), subject_class=True)
    model = RLIPParSeDA(cfg)
    M = cfg.num_queries // 2
    T = cfg.max_obj_texts + cfg.max_verb_texts
    tagger_tgt = HOITargets(
        obj_labels=jnp.zeros((1, M), jnp.int32),
        sub_labels=jnp.zeros((1, M), jnp.int32),
        verb_labels=jnp.zeros((1, M, cfg.max_verb_texts)),
        sub_boxes=jnp.full((1, M, 4), 0.5),
        obj_boxes=jnp.full((1, M, 4), 0.5),
        valid=jnp.ones((1, M), bool),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.ones((1, 64, 64), bool),
        jnp.zeros((1, T, cfg.text_encoder.hidden_size)),
        jnp.ones((1, T), bool),
        tagger_tgt, jax.random.PRNGKey(1), cfg.max_obj_texts,
        method=RLIPParSeDA.forward_tagger,
    )
    rng = np.random.RandomState(1)
    enc = CachedTextEncoder(
        lambda texts: rng.randn(
            len(texts), cfg.text_encoder.hidden_size
        ).astype(np.float32)
    )
    annos = generate_pseudo_annotations(
        model, params, rel_ds, enc, cfg,
        relation_threshold=0.0, dataset_name="coco2017",
    )
    assert len(annos) == 3
    assert all(a["dataset"] == "coco2017" for a in annos)
    assert all(len(a["objects"]) == 2 for a in annos)
    total_rels = sum(len(a["relationships"]) for a in annos)
    assert total_rels > 0
    assert all(
        "confidence" in r for a in annos for r in a["relationships"]
    )
    pseudo_file = tmp_path / "coco_pseudo.json"
    pseudo_file.write_text(json.dumps(annos))

    # 4. consume the pseudo annotations for pretraining (thresholding)
    from rlipv2_tpu.data.vg import VGRelDataset

    train_ds = VGRelDataset(
        pseudo_file, {"coco2017": img_dir.parent},
        num_queries=cfg.num_queries,
        transforms=HOITransform(train=False, val_size=64, max_size=96),
        relation_threshold=0.0,
        drop_relationless=False,
    )
    assert len(train_ds) == 3
    img2, tgt2 = train_ds[0]
    assert "verb_labels" in tgt2 or "hois" in tgt2 or "sub_boxes" in tgt2

    # thresholding above every confidence removes all relations
    hi = VGRelDataset(
        pseudo_file, {"coco2017": img_dir.parent},
        num_queries=cfg.num_queries,
        transforms=HOITransform(train=False, val_size=64, max_size=96),
        relation_threshold=1.1,
        drop_relationless=True,
    )
    assert len(hi) == 0
