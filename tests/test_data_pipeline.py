"""Data layer: synthetic HICO annotations -> dataset -> transforms ->
text merge/sampling -> static batch -> one model step."""

import json
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.data.collate import make_hoi_batch, pick_bucket
from rlipv2_tpu.data.hico import HICODataset
from rlipv2_tpu.data.pipeline import build_train_batch
from rlipv2_tpu.data.text import merge_batch_texts, pack_text_slots, sample_negative_texts
from rlipv2_tpu.data.transforms import HOITransform, normalize_boxes
from rlipv2_tpu.data.vocab import HICO_OBJECT_NAMES, HICO_VERB_NAMES, VALID_OBJ_IDS

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def synth_hico(tmp_path_factory):
    root = tmp_path_factory.mktemp("hico")
    (root / "images").mkdir()
    rng = np.random.RandomState(0)
    annos = []
    for i in range(4):
        h, w = int(rng.randint(200, 400)), int(rng.randint(200, 400))
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        name = f"img_{i}.jpg"
        Image.fromarray(img).save(root / "images" / name)
        boxes = []
        for _ in range(3):
            x0, y0 = rng.randint(0, w - 60), rng.randint(0, h - 60)
            boxes.append([int(x0), int(y0), int(x0 + 50), int(y0 + 50)])
        annos.append(
            {
                "file_name": name,
                "annotations": [
                    {"bbox": boxes[0], "category_id": 1},  # person
                    {"bbox": boxes[1], "category_id": 18},  # horse (idx 17)
                    {"bbox": boxes[2], "category_id": 2},  # bicycle
                ],
                "hoi_annotation": [
                    {"subject_id": 0, "object_id": 1, "category_id": 88},
                    {"subject_id": 0, "object_id": 1, "category_id": 77},
                    {"subject_id": 0, "object_id": 2, "category_id": 88},
                ],
            }
        )
    anno_file = root / "train.json"
    anno_file.write_text(json.dumps(annos))
    return root, anno_file


def test_dataset_train_targets(synth_hico):
    root, anno_file = synth_hico
    ds = HICODataset(
        "train",
        root / "images",
        anno_file,
        transforms=HOITransform(train=False),  # deterministic resize
    )
    assert len(ds) == 4
    img, target = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3
    # duplicate (0,1) pair must merge into one multi-hot row
    assert target["obj_labels"].shape == (2,)
    assert target["verb_labels"].shape == (2, 117)
    assert target["verb_labels"][0].sum() == 2  # verbs 88 and 77
    assert target["obj_labels"][0] == 16  # COCO id 18 == dog -> index 16
    assert (target["sub_labels"] == 0).all()


def test_dataset_val_targets(synth_hico):
    root, anno_file = synth_hico
    ds = HICODataset("val", root / "images", anno_file)
    img, target = ds[1]
    assert target["hois"].shape == (3, 3)
    assert target["boxes"].shape == (3, 4)
    # val boxes stay in ORIGINAL pixel coords
    assert target["boxes"].max() > 2


def test_merge_and_pack():
    obj_texts = [["cat", "dog"], ["dog", "horse"]]
    verb_texts = [["ride", "pet"], ["pet", "feed"]]
    obj_labels = [np.array([0, 1]), np.array([1])]
    sub_labels = [np.array([0, 0]), np.array([0])]
    verb_labels = [
        np.array([[1, 0], [0, 1]], np.float32),
        np.array([[1, 1]], np.float32),
    ]
    mo, mv, no, ns, nv = merge_batch_texts(
        obj_texts, verb_texts, obj_labels, sub_labels, verb_labels
    )
    assert mo == ["cat", "dog", "horse"]
    assert mv == ["ride", "pet", "feed"]
    np.testing.assert_array_equal(no[0], [0, 1])
    np.testing.assert_array_equal(no[1], [2])
    # image 2's verbs remap: pet -> slot 1, feed -> slot 2
    np.testing.assert_array_equal(nv[1][0], [0, 1, 1])

    sampled = sample_negative_texts(
        mo, 6, HICO_OBJECT_NAMES, strategy="random", rng=random.Random(0)
    )
    assert len(sampled) == 6 and sampled[:3] == mo
    obj_slots, verb_slots, ov, vv = pack_text_slots(sampled, mv, 8, 5)
    assert obj_slots[-1] == "no objects" and ov[-1] and not ov[6]
    assert vv.sum() == 3


def test_build_train_batch_and_model_step(synth_hico):
    from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
    from test_parseda_forward import tiny_config

    root, anno_file = synth_hico
    ds = HICODataset(
        "train", root / "images", anno_file, transforms=HOITransform(train=True, rng=random.Random(1))
    )
    samples = [ds[i] for i in range(2)]
    arrays, obj_slots, verb_slots = build_train_batch(
        samples,
        max_obj_texts=81,
        max_verb_texts=117,
        max_triplets=6,
        negative_text_sampling=0,
        obj_vocab=HICO_OBJECT_NAMES,
        verb_vocab=HICO_VERB_NAMES,
        sampling_strategy="random",
        rng=random.Random(2),
    )
    assert arrays["pixels"].shape[0] == 2 and arrays["pixels"].shape[3] == 3
    assert arrays["verb_labels"].shape == (2, 6, 117)
    assert len(obj_slots) == 81 and len(verb_slots) == 117
    # boxes normalized
    tv = arrays["triplet_valid"]
    assert tv.any()
    assert arrays["sub_boxes"][tv].max() <= 1.0
    assert arrays["sub_boxes"][tv].min() >= 0.0

    # feed a tiny model (proves array contracts line up end to end)
    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    B = 2
    px = jnp.asarray(arrays["pixels"][:, ::8, ::8])  # shrink for test speed
    pv = jnp.asarray(arrays["pixel_valid"][:, ::8, ::8])
    T = cfg.max_obj_texts + cfg.max_verb_texts
    te = jnp.zeros((B, T, cfg.text_encoder.hidden_size))
    tvv = jnp.ones((B, T), bool)
    params = init_model_params(
        model, jax.random.PRNGKey(0), px, pv, te, tvv, cfg.max_obj_texts,
        jnp.ones((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32),
    )
    out = model.apply(params, px, pv, te, tvv, cfg.max_obj_texts)
    assert np.isfinite(np.asarray(out["pred_verb_logits"])).all()


def test_pick_bucket():
    assert pick_bucket(500, 500) == (512, 512)
    assert pick_bucket(700, 1100) == (832, 1344)
    assert pick_bucket(2000, 2000) == (1344, 1344)  # fallback largest by area
    # batch envelope of a tall portrait + a wide landscape: hmax/wmax
    # combine to a shape no single-image bucket contains — must land in
    # the cover-all row, not the old (1088, 1088) fallback whose
    # containment assert fired (r5 loader-bench regression)
    assert pick_bucket(1096, 800) == (1344, 832)
    assert pick_bucket(1096, 1024) == (1344, 1344)


def test_normalize_boxes_roundtrip():
    b = np.array([[10.0, 20.0, 110.0, 220.0]])
    n = normalize_boxes(b, 400, 200)
    np.testing.assert_allclose(n, [[0.3, 0.3, 0.5, 0.5]], atol=1e-6)


def test_dataset_verb_hm_targets(synth_hico):
    """build_verb_hm=True adds the CenterNet-style GT verb heatmap at the
    transformed image resolution (reference datasets/hico.py:376-407 under
    --DETRHOIhm; construction oracle-tested in test_heatmap_targets.py)."""
    root, anno_file = synth_hico
    ds = HICODataset(
        "train",
        root / "images",
        anno_file,
        transforms=HOITransform(train=False),
        build_verb_hm=True,
    )
    img, target = ds[0]
    hm = target["verb_hm"]
    assert hm.shape == (1,) + img.shape[:2]
    # one gaussian per pair, max-blended: full-strength peak at each
    # pair's center midpoint
    assert hm.max() > 0.99
    n = target["sub_boxes"].shape[0]
    for i in range(n):
        s, o = target["sub_boxes"][i], target["obj_boxes"][i]
        cx = int((s[0] + s[2] + o[0] + o[2]) / 4)
        cy = int((s[1] + s[3] + o[1] + o[3]) / 4)
        assert hm[0, cy, cx] > 0.99
