"""V-COCO and OI-SGG evaluator parity vs the reference implementations
(imported from /root/reference as oracles) on randomized synthetic data."""

import importlib.util
import types

import numpy as np
import pytest

from rlipv2_tpu.eval.oi_sgg_eval import OISGGEvaluator, score_wtd
from rlipv2_tpu.eval.vcoco_eval import VCOCOEvaluator

torch = pytest.importorskip("torch")


def load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def synth(seed, n_images=5, nq=6, n_obj=4, n_verb=5, rel_key="hois", allow_no_obj=False):
    rng = np.random.RandomState(seed)
    preds, gts = [], []
    for i in range(n_images):
        n = nq
        sb = rng.uniform(0, 150, (n, 2))
        sb = np.concatenate([sb, sb + rng.uniform(30, 100, (n, 2))], 1)
        ob = rng.uniform(0, 150, (n, 2))
        ob = np.concatenate([ob, ob + rng.uniform(30, 100, (n, 2))], 1)
        labels = np.concatenate([np.zeros(n, np.int64), rng.randint(0, n_obj, n)])
        preds.append(
            {
                "labels": labels,
                "boxes": np.concatenate([sb, ob], 0),
                "verb_scores": rng.rand(n, n_verb),
                "sub_ids": np.arange(n),
                "obj_ids": np.arange(n, 2 * n),
            }
        )
        m = rng.randint(1, 4)
        gi = rng.randint(0, n, m)
        g_boxes = np.concatenate(
            [sb[gi] + rng.uniform(-8, 8, (m, 4)), ob[gi] + rng.uniform(-8, 8, (m, 4))], 0
        )
        g_labels = np.concatenate([np.zeros(m, np.int64), labels[n + gi]])
        obj_col = np.arange(m) + m
        if allow_no_obj:
            noobj = rng.rand(m) < 0.3
            obj_col = np.where(noobj, -1, obj_col)
        rels = np.stack([np.arange(m), obj_col, rng.randint(0, n_verb, m)], 1)
        gts.append(
            {
                "filename": f"i{i}.jpg",
                "boxes": g_boxes,
                "labels": g_labels,
                rel_key: rels,
            }
        )
    return preds, gts


def test_vcoco_matches_reference():
    RefMod = load_ref("/root/reference/datasets/vcoco_eval.py", "ref_vcoco")
    for seed in (0, 1):
        preds, gts = synth(seed, n_verb=29, allow_no_obj=True)
        correct_mat = (np.random.RandomState(seed).rand(29, 4) > 0.2).astype(float)

        t_preds = [{k: torch.from_numpy(np.asarray(v)) for k, v in p.items()} for p in preds]
        t_gts = [
            {
                "boxes": torch.from_numpy(g["boxes"]),
                "labels": torch.from_numpy(g["labels"]),
                "hois": torch.from_numpy(g["hois"]),
            }
            for g in gts
        ]
        args = types.SimpleNamespace(use_nms_filter=False)
        ref = RefMod.VCOCOEvaluator(
            t_preds, t_gts, 0, correct_mat.copy(), args=args
        ).evaluate()
        ours = VCOCOEvaluator(preds, gts, correct_mat.copy()).evaluate()
        for k in ("mAP_all", "mAP_thesis"):
            assert abs(ours[k] - ref[k]) < 1e-9, (seed, k, ours[k], ref[k])


@pytest.mark.parametrize("use_nms", [False, True])
def test_oisgg_matches_reference(use_nms):
    RefMod = load_ref("/root/reference/datasets/oi_sgg_eval.py", "ref_oisgg")
    for seed in (0, 1):
        preds, gts = synth(seed, n_obj=6, n_verb=4, rel_key="rels")
        t_preds = [{k: torch.from_numpy(np.asarray(v)) for k, v in p.items()} for p in preds]
        t_gts = [
            {
                "filename": g["filename"],
                "boxes": torch.from_numpy(g["boxes"]),
                "labels": torch.from_numpy(g["labels"]),
                "rels": torch.from_numpy(g["rels"]),
            }
            for g in gts
        ]
        args = types.SimpleNamespace(
            use_nms_filter=use_nms, thres_nms=0.7, nms_alpha=1.0, nms_beta=0.5,
            thres_nms_phr=0.7,
        )
        ref = RefMod.OISGGEvaluator(t_preds, t_gts, None, topK=50, args=args).evaluate()
        ours = OISGGEvaluator(preds, gts, topk=50, use_nms_filter=use_nms).evaluate()
        for k in ref:
            assert abs(ours[k] - ref[k]) < 1e-9, (seed, k, ours[k], ref[k])


def test_score_wtd_formula():
    r50 = {"max recall@50 (RelD)": 0.6}
    r100 = {
        "mAP@100 (RelD)": 0.5,
        "mAP@100 (PhrD)": 0.4,
        "wmAP@100 (RelD)": 0.55,
        "wmAP@100 (PhrD)": 0.45,
    }
    s = score_wtd(r50, r100)
    assert abs(s["score_wtd (mAP)"] - (0.2 * 0.6 + 0.4 * 0.5 + 0.4 * 0.4)) < 1e-12
    assert abs(s["score_wtd (wmAP)"] - (0.2 * 0.6 + 0.4 * 0.55 + 0.4 * 0.45)) < 1e-12
