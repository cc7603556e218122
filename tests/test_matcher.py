"""LSAP solver vs scipy, and HOI matching-cost parity with a torch-free
re-derivation of the reference cost formulas."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from rlipv2_tpu.losses.matcher import hoi_matching_costs, hungarian_match, lsap_jax
from rlipv2_tpu.structures import HOITargets


def test_lsap_matches_scipy_random():
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(1, 12)
        m = rng.randint(n, 20)
        c = rng.randn(n, m).astype(np.float32) * 5
        ours = np.asarray(lsap_jax(jnp.asarray(c)))
        ri, ci = linear_sum_assignment(c)
        # optimal VALUE must match (assignment may tie)
        ours_val = c[np.arange(n), ours].sum()
        scipy_val = c[ri, ci].sum()
        assert abs(ours_val - scipy_val) < 1e-3, (trial, ours_val, scipy_val)
        assert len(set(ours.tolist())) == n  # distinct columns


def test_lsap_padded_rows_invariant():
    """Constant padded rows must not change real rows' optimal value."""
    rng = np.random.RandomState(1)
    for _ in range(10):
        n, m = 5, 12
        c = rng.randn(n, m).astype(np.float32)
        padded = np.concatenate([c, np.zeros((3, m), np.float32)], axis=0)
        a_real = np.asarray(lsap_jax(jnp.asarray(c)))
        a_pad = np.asarray(lsap_jax(jnp.asarray(padded)))
        val_real = c[np.arange(n), a_real].sum()
        val_pad = c[np.arange(n), a_pad[:n]].sum()
        assert abs(val_real - val_pad) < 1e-3


def test_batched_hungarian():
    rng = np.random.RandomState(2)
    c = rng.randn(4, 16, 6).astype(np.float32)
    out = np.asarray(hungarian_match(jnp.asarray(c)))
    assert out.shape == (4, 6)
    for b in range(4):
        ri, ci = linear_sum_assignment(c[b].T)  # rows = targets
        ours_val = c[b].T[np.arange(6), out[b]].sum()
        assert abs(ours_val - c[b].T[ri, ci].sum()) < 1e-3


def np_reference_costs(outputs, tgt, verb_valid):
    """Reference cost formulas re-derived in numpy for one image (no padded
    target slots, all verb text slots valid)."""

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    def to_xyxy(b):
        return np.concatenate(
            [b[..., :2] - b[..., 2:] / 2, b[..., :2] + b[..., 2:] / 2], -1
        )

    def giou(a, b):
        n, m = len(a), len(b)
        out = np.zeros((n, m))
        for i in range(n):
            for j in range(m):
                iw = max(0, min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]))
                ih = max(0, min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]))
                inter = iw * ih
                ua = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                ub = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
                union = ua + ub - inter
                hull = (max(a[i, 2], b[j, 2]) - min(a[i, 0], b[j, 0])) * (
                    max(a[i, 3], b[j, 3]) - min(a[i, 1], b[j, 1])
                )
                out[i, j] = inter / union - (hull - union) / hull
        return out

    op = softmax(outputs["pred_obj_logits"][0])
    vp = sigmoid(outputs["pred_verb_logits"][0])
    c_obj = -op[:, tgt["obj_labels"]]
    T = tgt["verb_labels"]  # (M, V)
    pos = vp @ T.T / (T.sum(-1) + 1e-4)
    neg = (1 - vp) @ (1 - T).T / ((1 - T).sum(-1) + 1e-4)
    c_verb = -(pos + neg) / 2
    sb, ob = outputs["pred_sub_boxes"][0], outputs["pred_obj_boxes"][0]
    l1s = np.abs(sb[:, None] - tgt["sub_boxes"][None]).sum(-1)
    l1o = np.abs(ob[:, None] - tgt["obj_boxes"][None]).sum(-1)
    exist = (tgt["obj_boxes"] != 0).any(-1)
    l1o = l1o * exist[None]
    c_bbox = np.maximum(l1s, l1o)
    gs = -giou(to_xyxy(sb), to_xyxy(tgt["sub_boxes"]))
    go = -giou(to_xyxy(ob), to_xyxy(tgt["obj_boxes"])) + gs * (~exist)[None]
    c_giou = np.maximum(gs, go)
    return c_obj + c_verb + 2.5 * c_bbox + c_giou


def test_costs_match_reference_formula():
    rng = np.random.RandomState(3)
    Q, M, To, Tv = 10, 4, 6, 5
    outputs = {
        "pred_obj_logits": rng.randn(1, Q, To).astype(np.float32),
        "pred_verb_logits": rng.randn(1, Q, Tv).astype(np.float32),
        "pred_sub_boxes": rng.uniform(0.2, 0.8, (1, Q, 4)).astype(np.float32),
        "pred_obj_boxes": rng.uniform(0.2, 0.8, (1, Q, 4)).astype(np.float32),
    }
    tgt = {
        "obj_labels": rng.randint(0, To, M),
        "verb_labels": (rng.rand(M, Tv) > 0.5).astype(np.float32),
        "sub_boxes": rng.uniform(0.2, 0.8, (M, 4)).astype(np.float32),
        "obj_boxes": rng.uniform(0.2, 0.8, (M, 4)).astype(np.float32),
    }
    tgt["obj_boxes"][1] = 0.0  # a no-object pair
    targets = HOITargets(
        obj_labels=jnp.asarray(tgt["obj_labels"])[None],
        sub_labels=jnp.zeros((1, M), jnp.int32),
        verb_labels=jnp.asarray(tgt["verb_labels"])[None],
        sub_boxes=jnp.asarray(tgt["sub_boxes"])[None],
        obj_boxes=jnp.asarray(tgt["obj_boxes"])[None],
        valid=jnp.ones((1, M), bool),
    )
    costs = hoi_matching_costs(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        targets,
        verb_valid=jnp.ones((1, Tv), bool),
    )
    ref = np_reference_costs(outputs, tgt, None)
    np.testing.assert_allclose(np.asarray(costs.total[0]), ref, atol=2e-4)


def test_padded_verb_slots_excluded():
    """Invalid verb text slots must not contribute to the negative term."""
    rng = np.random.RandomState(4)
    Q, M, To, Tv = 6, 2, 4, 8
    outputs = {
        "pred_obj_logits": jnp.asarray(rng.randn(1, Q, To).astype(np.float32)),
        "pred_verb_logits": jnp.asarray(rng.randn(1, Q, Tv).astype(np.float32)),
        "pred_sub_boxes": jnp.asarray(rng.uniform(0.3, 0.7, (1, Q, 4)).astype(np.float32)),
        "pred_obj_boxes": jnp.asarray(rng.uniform(0.3, 0.7, (1, Q, 4)).astype(np.float32)),
    }
    verbs = np.zeros((1, M, Tv), np.float32)
    verbs[0, :, 0] = 1.0
    targets = HOITargets(
        obj_labels=jnp.zeros((1, M), jnp.int32),
        sub_labels=jnp.zeros((1, M), jnp.int32),
        verb_labels=jnp.asarray(verbs),
        sub_boxes=jnp.full((1, M, 4), 0.5),
        obj_boxes=jnp.full((1, M, 4), 0.5),
        valid=jnp.ones((1, M), bool),
    )
    vv = np.ones((1, Tv), bool)
    vv[0, 5:] = False
    c_masked = hoi_matching_costs(outputs, targets, jnp.asarray(vv))
    # same computation where the padded slots' logits are irrelevant:
    # perturb logits at invalid slots -> cost must not change
    out2 = dict(outputs)
    pert = np.asarray(outputs["pred_verb_logits"]).copy()
    pert[:, :, 5:] += 10.0
    out2["pred_verb_logits"] = jnp.asarray(pert)
    c_masked2 = hoi_matching_costs(out2, targets, jnp.asarray(vv))
    np.testing.assert_allclose(
        np.asarray(c_masked.verb_class), np.asarray(c_masked2.verb_class), atol=1e-6
    )
