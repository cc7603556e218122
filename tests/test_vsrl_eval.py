"""Official V-COCO protocol parity: our VCOCOOfficialEval vs the reference
datasets/vsrl_eval.py (imported as oracle, printed APs parsed) on
randomized synthetic ground truth + detections; plus unit tests for the
official detection-dict generation (generate_vcoco_official.py:494-532)."""

import contextlib
import importlib.util
import io
import pickle
import re
import sys
import types

import numpy as np
import pytest

from rlipv2_tpu.eval.vsrl_eval import (
    VCOCOOfficialEval,
    detections_from_results,
    save_detections,
)

ACTIONS = ["hold", "cut", "look", "point", "ride"]
ROLES = [
    ["agent", "obj"],
    ["agent", "obj", "instr"],
    ["agent"],
    ["agent", "instr"],
    ["agent", "obj"],
]


def load_oracle():
    # the reference module imports ipdb + pycocotools at top level
    for name in ["ipdb", "pycocotools", "pycocotools.coco"]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name.endswith("coco"):
                mod.COCO = object
            sys.modules[name] = mod
    if not hasattr(np, "bool"):
        np.bool = bool  # removed alias used by the 2017-era oracle
    spec = importlib.util.spec_from_file_location(
        "ref_vsrl_eval", "/root/reference/datasets/vsrl_eval.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def synth_db_and_dets(seed, n_images=5, n_actions=len(ACTIONS)):
    rng = np.random.RandomState(seed)
    db, dets = [], []
    for i in range(n_images):
        n_person = rng.randint(1, 4)
        n_obj = rng.randint(1, 4)
        n = n_person + n_obj
        boxes = rng.uniform(0, 200, (n, 2))
        boxes = np.concatenate([boxes, boxes + rng.uniform(30, 150, (n, 2))], 1).astype(
            np.float32
        )
        gt_classes = np.asarray([1] * n_person + [2] * n_obj, np.int32)
        gt_actions = rng.randint(0, 2, (n, n_actions)).astype(np.int32)
        # some unannotated (ignored) person instances
        for p in range(n_person):
            if rng.rand() < 0.25:
                gt_actions[p] = -1
        gt_actions[n_person:] = -1  # objects carry no actions
        gt_role_id = -np.ones((n, n_actions, 2), np.int32)
        for p in range(n_person):
            for a in range(n_actions):
                for r in range(len(ROLES[a]) - 1):
                    if gt_actions[p, a] == 1 and rng.rand() < 0.7:
                        gt_role_id[p, a, r] = n_person + rng.randint(n_obj)
        db.append(
            {
                "id": 100 + i,
                "boxes": boxes,
                "gt_classes": gt_classes,
                "gt_actions": gt_actions,
                "gt_role_id": gt_role_id,
            }
        )
        # detections: a few per image, full official key space
        for _ in range(rng.randint(1, 5)):
            pb = rng.uniform(0, 200, (2,))
            det = {
                "image_id": 100 + i,
                "person_box": np.concatenate(
                    [pb, pb + rng.uniform(30, 150, (2,))]
                ).tolist(),
            }
            for a, action in enumerate(ACTIONS):
                det[f"{action}_agent"] = float(rng.rand())
                for role in ROLES[a][1:]:
                    u = rng.rand()
                    if u < 0.15:
                        role_box = [0.0, 0.0, 0.0, 0.0]
                    elif u < 0.3:
                        role_box = [np.nan] * 4
                    else:
                        rb = rng.uniform(0, 200, (2,))
                        role_box = np.concatenate(
                            [rb, rb + rng.uniform(30, 150, (2,))]
                        ).tolist()
                    det[f"{action}_{role}"] = role_box + [float(rng.rand())]
            dets.append(det)
    return db, dets


def oracle_eval(db, dets, tmp_path, scenario):
    m = load_oracle()
    ev = object.__new__(m.VCOCOeval)
    ev.actions = list(ACTIONS)
    ev.roles = [list(r) for r in ROLES]
    ev.num_actions = len(ACTIONS)
    dets_file = tmp_path / "dets.pkl"
    with open(dets_file, "wb") as f:
        pickle.dump(dets, f, protocol=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ev._do_role_eval(db, str(dets_file), ovr_thresh=0.5, eval_type=f"scenario_{scenario}")
    text = buf.getvalue()
    per_role = {
        mm.group(1).strip(): float(mm.group(2))
        for mm in re.finditer(r"([\w-]+): AP = ([\d.]+) \(#pos", text)
    }
    avg = float(
        re.search(rf"Average Role \[scenario_{scenario}\] AP = ([\d.]+)", text).group(1)
    )
    return per_role, avg


def oracle_agent_eval(db, dets, tmp_path):
    m = load_oracle()
    ev = object.__new__(m.VCOCOeval)
    ev.actions = list(ACTIONS)
    ev.roles = [list(r) for r in ROLES]
    ev.num_actions = len(ACTIONS)
    dets_file = tmp_path / "dets_agent.pkl"
    with open(dets_file, "wb") as f:
        pickle.dump(dets, f, protocol=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ev._do_agent_eval(db, str(dets_file), ovr_thresh=0.5)
    text = buf.getvalue()
    avg = float(re.search(r"Average Agent AP = ([\d.]+)", text).group(1))
    return avg


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("scenario", [1, 2])
def test_role_eval_parity(seed, scenario, tmp_path):
    db, dets = synth_db_and_dets(seed)
    ours = VCOCOOfficialEval(db, ACTIONS, ROLES).role_eval(dets, scenario=scenario)
    per_role, avg = oracle_eval(db, dets, tmp_path, scenario)
    assert ours["avg_role_ap"] * 100 == pytest.approx(avg, abs=0.006)
    for a, action in enumerate(ACTIONS):
        for r, role in enumerate(ROLES[a][1:]):
            key = f"{action}-{role}"
            assert ours["role_ap"][a, r] * 100 == pytest.approx(
                per_role[key], abs=0.006
            ), key


@pytest.mark.parametrize("seed", [3, 4])
def test_agent_eval_parity(seed, tmp_path):
    db, dets = synth_db_and_dets(seed)
    ours = VCOCOOfficialEval(db, ACTIONS, ROLES).agent_eval(dets)
    avg = oracle_agent_eval(db, dets, tmp_path)
    assert ours["avg_agent_ap"] * 100 == pytest.approx(avg, abs=0.006)


def test_detections_from_results_semantics(tmp_path):
    """Official detection-dict generation: agent keys, role keys with
    object box + score, NaN box for missing objects, cut/hit/eat agent =
    max over variants (reference: generate_vcoco_official.py:494-532)."""
    verb_classes = [
        "hold_obj", "stand", "cut_instr", "cut_obj", "eat_obj", "eat_instr",
    ]
    n, V = 2, len(verb_classes)
    results = [
        {
            "labels": np.asarray([0, 0, 5, 80]),  # second object missing
            "boxes": np.asarray(
                [[0, 0, 10, 10], [1, 1, 11, 11], [2, 2, 12, 12], [3, 3, 13, 13]],
                np.float64,
            ),
            "verb_scores": np.asarray(
                [[0.9, 0.8, 0.7, 0.6, 0.5, 0.4], [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]]
            ),
            "sub_ids": np.asarray([0, 1]),
            "obj_ids": np.asarray([2, 3]),
        }
    ]
    dets = detections_from_results([42], results, verb_classes)
    assert len(dets) == 2
    d0, d1 = dets
    assert d0["image_id"] == 42 and d0["person_box"] == [0, 0, 10, 10]
    assert d0["hold_obj"] == [2, 2, 12, 12, 0.9]
    assert d0["hold_agent"] == 0.9
    assert d0["stand_agent"] == 0.8
    assert d0["cut_agent"] == pytest.approx(0.7)  # max(cut_instr, cut_obj)
    assert d0["eat_agent"] == pytest.approx(0.5)
    # missing object -> NaN box
    assert np.all(np.isnan(d1["hold_obj"][:4])) and d1["hold_obj"][4] == 0.1
    p = tmp_path / "official.pkl"
    save_detections(dets, p)
    with open(p, "rb") as f:
        assert len(pickle.load(f)) == 2
