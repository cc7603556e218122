"""Tagger inference tool: candidates -> VG-format pseudo relations."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.engine.loops import CachedTextEncoder
from rlipv2_tpu.models.parseda import RLIPParSeDA
from rlipv2_tpu.structures import HOITargets
from rlipv2_tpu.tools.generate_relations import generate_pseudo_annotations
from test_parseda_forward import tiny_config


class FakeTaggerDataset:
    object_names = ["person", "horse", "dog", "tree"]

    def __init__(self, n=2):
        rng = np.random.RandomState(0)
        self.items = []
        for i in range(n):
            img = rng.randn(64, 64, 3).astype(np.float32)
            boxes = rng.uniform(0.3, 0.6, (3, 4)).astype(np.float32)
            labels = np.array([0, 1, 3])
            cands = [
                ([(0, 1), (0, 2)], ["rides", "stands near"]),
                ([(1, 2)], ["next to"]),
            ]
            self.items.append(
                (img, {"boxes": boxes, "labels": labels,
                       "relation_candidates": cands, "image_id": 100 + i})
            )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_generate_pseudo_annotations():
    cfg = dataclasses.replace(tiny_config(), subject_class=True)
    model = RLIPParSeDA(cfg)
    ds = FakeTaggerDataset()
    M = cfg.num_queries // 2
    B = 1
    T = cfg.max_obj_texts + cfg.max_verb_texts
    tgt = HOITargets(
        obj_labels=jnp.zeros((B, M), jnp.int32),
        sub_labels=jnp.zeros((B, M), jnp.int32),
        verb_labels=jnp.zeros((B, M, cfg.max_verb_texts)),
        sub_boxes=jnp.full((B, M, 4), 0.5),
        obj_boxes=jnp.full((B, M, 4), 0.5),
        valid=jnp.ones((B, M), bool),
    )
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, 64, 64, 3)),
        jnp.ones((B, 64, 64), bool),
        jnp.zeros((B, T, cfg.text_encoder.hidden_size)),
        jnp.ones((B, T), bool),
        tgt,
        jax.random.PRNGKey(1),
        cfg.max_obj_texts,
        method=RLIPParSeDA.forward_tagger,
    )

    rng = np.random.RandomState(1)
    enc = CachedTextEncoder(
        lambda texts: rng.randn(len(texts), cfg.text_encoder.hidden_size).astype(
            np.float32
        )
    )
    annos = generate_pseudo_annotations(
        model, params, ds, enc, cfg, relation_threshold=0.0, dataset_name="coco2017"
    )
    assert len(annos) == 2
    a = annos[0]
    assert a["dataset"] == "coco2017"
    assert len(a["objects"]) == 3
    assert a["objects"][1]["names"] == "horse"
    # threshold 0 keeps everything: 2 pairs x 2 rels + 1 pair x 1 rel = 5
    assert len(a["relationships"]) == 5
    assert all("confidence" in r for r in a["relationships"])
    assert all(0 <= r["confidence"] <= 1 for r in a["relationships"])

    # high threshold filters
    annos2 = generate_pseudo_annotations(
        model, params, ds, enc, cfg, relation_threshold=1.1, max_images=1
    )
    assert len(annos2[0]["relationships"]) == 0


def test_batched_rows_match_per_group_path():
    """tag_rows_batched (one jitted forward per batch of candidate groups,
    VERDICT r2 item 8) produces the same relationships as the per-group
    oracle `tag_image`, including when the last batch is wrap-padded."""
    from rlipv2_tpu.tools.generate_relations import tag_image

    cfg = dataclasses.replace(tiny_config(), subject_class=True)
    model = RLIPParSeDA(cfg)
    ds = FakeTaggerDataset(n=3)  # 3 images x 2 groups = 6 rows
    M = cfg.num_queries // 2
    T = cfg.max_obj_texts + cfg.max_verb_texts
    tgt = HOITargets(
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
        tgt,
        jax.random.PRNGKey(1),
        cfg.max_obj_texts,
        method=RLIPParSeDA.forward_tagger,
    )
    rng = np.random.RandomState(1)
    enc = CachedTextEncoder(
        lambda texts: rng.randn(len(texts), cfg.text_encoder.hidden_size).astype(
            np.float32
        )
    )

    # batched path: batch_size 4 over 6 rows -> one full batch + one
    # wrap-padded batch
    annos = generate_pseudo_annotations(
        model, params, ds, enc, cfg, relation_threshold=0.0, batch_size=4
    )

    # per-group oracle path
    tagger_apply = jax.jit(
        lambda p, px, v, te, tv, tg: model.apply(
            p, px, v, te, tv, tg, jax.random.PRNGKey(0), cfg.max_obj_texts,
            training=False, method=RLIPParSeDA.forward_tagger,
        )
    )
    for i, a in enumerate(annos):
        img, target = ds[i]
        h, w = img.shape[:2]
        ref = tag_image(
            tagger_apply, params, img, np.ones((h, w), bool),
            np.asarray(target["boxes"]), np.asarray(target["labels"]),
            target["relation_candidates"], ds.object_names, enc, cfg, 0.0,
        )
        got = a["relationships"]
        assert len(got) == len(ref)
        for g, r in zip(got, ref):
            assert g["predicate"] == r["predicate"]
            assert np.isclose(g["confidence"], r["confidence"], atol=1e-4)


def test_deduplicate_relationships():
    from rlipv2_tpu.tools.generate_relations import deduplicate_relationships

    annos = [
        {
            "image_id": 1,
            "relationships": [
                {"subject_id": 0, "object_id": 1, "predicate": "on", "confidence": 0.3},
                {"subject_id": 0, "object_id": 1, "predicate": "on", "confidence": 0.7},
                {"subject_id": 0, "object_id": 1, "predicate": "has", "confidence": 0.5},
                {"subject_id": 2, "object_id": 1, "predicate": "on", "confidence": 0.2},
            ],
        }
    ]
    out = deduplicate_relationships(annos)
    rels = out[0]["relationships"]
    assert len(rels) == 3
    on01 = [r for r in rels if r["predicate"] == "on" and r["subject_id"] == 0]
    assert len(on01) == 1 and on01[0]["confidence"] == 0.7
    # reference quirk: exact-confidence ties ALL survive
    annos2 = [{"image_id": 2, "relationships": [
        {"subject_id": 0, "object_id": 1, "predicate": "on", "confidence": 0.4},
        {"subject_id": 0, "object_id": 1, "predicate": "on", "confidence": 0.4},
    ]}]
    assert len(deduplicate_relationships(annos2)[0]["relationships"]) == 2


def test_merge_tagger_segments(tmp_path):
    import json

    from rlipv2_tpu.tools.generate_relations import merge_tagger_segments

    a = [{"image_id": 1, "dataset": "coco", "relationships": []}]
    b = [{"image_id": 2, "dataset": "coco", "relationships": []},
         {"image_id": 1, "dataset": "coco", "relationships": []}]
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a)); pb.write_text(json.dumps(b))
    out_file = tmp_path / "merged.json"
    merged = merge_tagger_segments([pa, pb], dataset_change_to="o365",
                                   save_merged_file=out_file)
    assert len(merged) == 3  # verbatim concat, duplicate image_ids kept
    assert all(m["dataset"] == "o365" for m in merged)
    assert json.loads(out_file.read_text()) == merged
