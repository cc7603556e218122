"""HICO evaluator parity: our evaluator vs the reference implementation
(imported from /root/reference as a test oracle) on randomized synthetic
predictions."""

import importlib.util
import types

import numpy as np
import pytest

from rlipv2_tpu.eval.hico_eval import HICOEvaluator

torch = pytest.importorskip("torch")


def load_reference_evaluator():
    spec = importlib.util.spec_from_file_location(
        "ref_hico_eval", "/root/reference/datasets/hico_eval.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.HICOEvaluator


def synth_case(seed, n_images=6, nq=8, n_obj=5, n_verb=7):
    rng = np.random.RandomState(seed)
    correct_mat = (rng.rand(n_verb, n_obj) > 0.3).astype(np.float64)
    preds, gts = [], []
    all_triplets = []
    for i in range(n_images):
        n = nq
        sub_boxes = rng.uniform(0, 200, (n, 2))
        sub_boxes = np.concatenate([sub_boxes, sub_boxes + rng.uniform(20, 120, (n, 2))], 1)
        obj_boxes = rng.uniform(0, 200, (n, 2))
        obj_boxes = np.concatenate([obj_boxes, obj_boxes + rng.uniform(20, 120, (n, 2))], 1)
        labels = np.concatenate([np.zeros(n, np.int64), rng.randint(0, n_obj, n)])
        boxes = np.concatenate([sub_boxes, obj_boxes], 0)
        verb_scores = rng.rand(n, n_verb)
        ids = np.arange(2 * n)
        preds.append(
            {
                "labels": labels,
                "boxes": boxes,
                "verb_scores": verb_scores,
                "sub_ids": ids[:n],
                "obj_ids": ids[n:],
            }
        )
        # GT: some boxes near predictions (to create TPs), some off
        m = rng.randint(1, 4)
        g_idx = rng.randint(0, n, m)
        g_sub = sub_boxes[g_idx] + rng.uniform(-5, 5, (m, 4))
        g_obj = obj_boxes[g_idx] + rng.uniform(-5, 5, (m, 4))
        g_boxes = np.concatenate([g_sub, g_obj], 0)
        g_labels = np.concatenate([np.zeros(m, np.int64), labels[n + g_idx]])
        hois = np.stack(
            [np.arange(m), np.arange(m) + m, rng.randint(0, n_verb, m)], 1
        )
        gts.append(
            {
                "filename": f"img_{i}.jpg",
                "boxes": g_boxes,
                "labels": g_labels,
                "hois": hois,
            }
        )
        for h in hois:
            all_triplets.append((0, int(g_labels[h[1]]), int(h[2])))
    uniq = list(dict.fromkeys(all_triplets))
    rare = uniq[: len(uniq) // 2]
    non_rare = uniq[len(uniq) // 2 :]
    return preds, gts, rare, non_rare, correct_mat


def run_reference(preds, gts, rare, non_rare, correct_mat, use_nms=False):
    RefEval = load_reference_evaluator()
    t_preds = [
        {k: torch.from_numpy(np.asarray(v)) for k, v in p.items()} for p in preds
    ]
    t_gts = []
    for g in gts:
        t_gts.append(
            {
                "filename": g["filename"],
                "boxes": torch.from_numpy(np.asarray(g["boxes"])),
                "labels": torch.from_numpy(np.asarray(g["labels"])),
                "hois": torch.from_numpy(np.asarray(g["hois"])),
            }
        )
    args = types.SimpleNamespace(
        use_nms_filter=use_nms, thres_nms=0.7, nms_alpha=1.0, nms_beta=0.5
    )
    ev = RefEval(t_preds, t_gts, 0, rare, non_rare, correct_mat, args=args)
    return ev.evaluate()


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("use_nms", [False, True])
def test_map_matches_reference(seed, use_nms):
    preds, gts, rare, non_rare, correct_mat = synth_case(seed)
    ours = HICOEvaluator(
        preds, gts, rare, non_rare, correct_mat, use_nms_filter=use_nms
    ).evaluate()
    ref = run_reference(preds, gts, rare, non_rare, correct_mat, use_nms=use_nms)
    for k in ["mAP", "mAP rare", "mAP non-rare", "mean max recall"]:
        assert abs(ours[k] - ref[k]) < 1e-9, (k, ours[k], ref[k])


def test_perfect_predictions_map_one():
    """Predictions identical to GT -> mAP 1.0."""
    rng = np.random.RandomState(3)
    n_verb, n_obj = 4, 3
    correct_mat = np.ones((n_verb, n_obj))
    preds, gts = [], []
    boxes = np.array([[10, 10, 50, 50], [60, 60, 120, 130]], dtype=np.float64)
    labels = np.array([0, 2])
    hois = np.array([[0, 1, 1]])
    gts.append({"filename": "a.jpg", "boxes": boxes, "labels": labels, "hois": hois})
    verb_scores = np.zeros((1, n_verb))
    verb_scores[0, 1] = 0.9
    preds.append(
        {
            "labels": labels,
            "boxes": boxes,
            "verb_scores": verb_scores,
            "sub_ids": np.array([0]),
            "obj_ids": np.array([1]),
        }
    )
    res = HICOEvaluator(preds, gts, [], [(0, 2, 1)], correct_mat).evaluate()
    assert res["mAP"] == pytest.approx(1.0)
