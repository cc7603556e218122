"""Self-contained COCO bbox evaluator: semantic checks of the COCOeval
protocol (101-pt AP over 10 IoU thresholds, ignore/crowd rules, area
buckets). Reference: datasets/coco_eval.py wraps pycocotools, which is not
in this environment — these cases have hand-derivable APs."""

import numpy as np

from rlipv2_tpu.eval.coco_eval import coco_evaluate_bbox


def gt_json(annos, n_imgs=2, cats=(1, 2)):
    return {
        "images": [{"id": i} for i in range(n_imgs)],
        "categories": [{"id": c, "name": str(c)} for c in cats],
        "annotations": [
            {**a, "id": i, "area": a["bbox"][2] * a["bbox"][3]}
            for i, a in enumerate(annos)
        ],
    }


def det(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": bbox, "score": score}


def test_perfect_detections():
    gts = gt_json(
        [
            {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]},
            {"image_id": 0, "category_id": 2, "bbox": [5, 5, 50, 60]},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 30, 30]},
        ]
    )
    preds = [
        det(0, 1, [10, 10, 40, 40], 0.9),
        det(0, 2, [5, 5, 50, 60], 0.8),
        det(1, 1, [0, 0, 30, 30], 0.7),
    ]
    r = coco_evaluate_bbox(preds, gts)
    assert r["mAP"] == 1.0 and r["mAP50"] == 1.0 and r["mAP75"] == 1.0
    assert r["AR@100"] == 1.0


def test_high_scoring_fp_halves_precision():
    gts = gt_json(
        [{"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]}],
        cats=(1,),
    )
    preds = [
        det(0, 1, [200, 200, 40, 40], 0.95),  # FP ranked first
        det(0, 1, [10, 10, 40, 40], 0.9),
    ]
    r = coco_evaluate_bbox(preds, gts)
    assert abs(r["mAP"] - 0.5) < 1e-6


def test_missed_gt_caps_recall():
    gts = gt_json(
        [
            {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 30, 30]},
        ],
        cats=(1,),
    )
    preds = [det(0, 1, [10, 10, 40, 40], 0.9)]
    r = coco_evaluate_bbox(preds, gts)
    # precision 1.0 at the 51 recall points <= 0.5, zero beyond
    assert abs(r["mAP"] - 51.0 / 101.0) < 1e-6
    assert abs(r["AR@100"] - 0.5) < 1e-6


def test_partial_iou_only_low_thresholds():
    # det IoU vs GT = 0.6 exactly: counts at thresholds .50/.55/.60
    gts = gt_json(
        [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 100, 100]}],
        cats=(1,),
    )
    preds = [det(0, 1, [0, 0, 100, 60], 0.9)]  # contained: 6000/10000 = .6
    r = coco_evaluate_bbox(preds, gts)
    assert abs(r["mAP"] - 0.3) < 1e-6
    assert r["mAP50"] == 1.0 and r["mAP75"] == 0.0


def test_crowd_absorbs_detection():
    gts = gt_json(
        [
            {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]},
            {"image_id": 0, "category_id": 1, "bbox": [100, 100, 80, 80],
             "iscrowd": 1},
        ],
        cats=(1,),
    )
    preds = [
        det(0, 1, [10, 10, 40, 40], 0.9),
        # inside the crowd region: ignored, NOT a false positive
        det(0, 1, [110, 110, 30, 30], 0.95),
    ]
    r = coco_evaluate_bbox(preds, gts)
    assert r["mAP"] == 1.0


def test_area_buckets():
    gts = gt_json(
        [
            {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]},  # small
            {"image_id": 0, "category_id": 1, "bbox": [50, 50, 200, 200]},  # large
        ],
        cats=(1,),
    )
    preds = [
        det(0, 1, [0, 0, 10, 10], 0.9),
        det(0, 1, [50, 50, 200, 200], 0.8),
    ]
    r = coco_evaluate_bbox(preds, gts)
    assert r["mAP"] == 1.0
    assert r["mAP_small"] == 1.0 and r["mAP_large"] == 1.0
    assert np.isnan(r["mAP_medium"])  # no medium GTs anywhere


def test_eval_dump_roundtrip_to_plot(tmp_path):
    """evaluate() populates pycocotools-shaped .eval; save_eval writes an
    npz that tools/plot_logs.plot_precision_recall reads (the reference's
    eval/latest.pth loop, main.py:797-803)."""
    import pytest

    matplotlib = pytest.importorskip("matplotlib")
    matplotlib.use("Agg")
    from rlipv2_tpu.eval.coco_eval import CocoBboxEvaluator
    from rlipv2_tpu.tools.plot_logs import plot_precision_recall

    gts = gt_json(
        [
            {"image_id": 0, "category_id": 1, "bbox": [10, 10, 40, 40]},
            {"image_id": 1, "category_id": 2, "bbox": [0, 0, 30, 30]},
        ]
    )
    ev = CocoBboxEvaluator(gts)
    ev.evaluate(
        [
            det(0, 1, [10, 10, 40, 40], 0.9),
            det(1, 2, [0, 0, 30, 30], 0.6),
            det(1, 2, [100, 100, 10, 10], 0.4),  # FP
        ]
    )
    P = ev.eval["precision"]
    assert P.shape == (10, 101, 2, 4, 1)
    # perfect cat-1 at IoU .5, area all: precision 1 at every recall point
    assert np.allclose(P[0, :, 0, 0, 0], 1.0)
    # scores at sampled recall points are the real det scores
    assert ev.eval["scores"][0, 0, 0, 0, 0] == 0.9
    # category 1 has no small-area GT -> -1 fill in that bucket
    assert np.all(P[:, :, 0, 1, 0] == -1)

    f = tmp_path / "latest.npz"
    ev.save_eval(f)
    fig, axs = plot_precision_recall([f])
    assert len(axs[0].get_lines()) == 1
    assert len(axs[0].get_lines()[0].get_xdata()) == 101
    matplotlib.pyplot.close(fig)
