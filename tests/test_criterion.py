"""SetCriterionHOI vs a torch re-derivation of the reference loss math
(no padding, so ragged==static)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from rlipv2_tpu.config import LossConfig
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.losses.matcher import hoi_matching_costs
from rlipv2_tpu.structures import HOITargets

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def make_case(rng, B=2, Q=12, M=3, To=6, Tv=5):
    outputs = {
        "pred_obj_logits": rng.randn(B, Q, To).astype(np.float32),
        "pred_verb_logits": rng.randn(B, Q, Tv).astype(np.float32),
        "pred_sub_boxes": rng.uniform(0.3, 0.7, (B, Q, 4)).astype(np.float32),
        "pred_obj_boxes": rng.uniform(0.3, 0.7, (B, Q, 4)).astype(np.float32),
    }
    tgt = {
        "obj_labels": rng.randint(0, To - 1, (B, M)),
        "verb_labels": (rng.rand(B, M, Tv) > 0.6).astype(np.float32),
        "sub_boxes": rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32),
        "obj_boxes": rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32),
    }
    tgt["verb_labels"][:, :, 0] = 1.0  # ensure positives
    return outputs, tgt


def torch_reference_losses(outputs, tgt, eos_coef=0.1):
    """Reference loss math re-derived with torch ops (single 'layer')."""
    B, Q, To = outputs["pred_obj_logits"].shape
    _, M, Tv = tgt["verb_labels"].shape
    # match with the same cost matrices our matcher produces
    targets = HOITargets(
        obj_labels=jnp.asarray(tgt["obj_labels"]),
        sub_labels=jnp.zeros((B, M), jnp.int32),
        verb_labels=jnp.asarray(tgt["verb_labels"]),
        sub_boxes=jnp.asarray(tgt["sub_boxes"]),
        obj_boxes=jnp.asarray(tgt["obj_boxes"]),
        valid=jnp.ones((B, M), bool),
    )
    costs = hoi_matching_costs(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        targets,
        jnp.ones((B, Tv), bool),
    )
    C = np.asarray(costs.total)
    matches = [linear_sum_assignment(C[b].T) for b in range(B)]  # rows=tgts

    num_interactions = float(B * M)

    # obj CE
    logits = torch.from_numpy(outputs["pred_obj_logits"])
    target_classes = torch.full((B, Q), To - 1, dtype=torch.long)
    for b, (ti, qi) in enumerate(matches):
        for t, q in zip(ti, qi):
            target_classes[b, q] = int(tgt["obj_labels"][b, t])
    w = torch.ones(To)
    w[-1] = eos_coef
    loss_obj_ce = F.cross_entropy(logits.transpose(1, 2), target_classes, w)

    # verb focal (_neg_loss)
    verb_logits = torch.from_numpy(outputs["pred_verb_logits"]).sigmoid()
    target_v = torch.zeros(B, Q, Tv)
    for b, (ti, qi) in enumerate(matches):
        for t, q in zip(ti, qi):
            target_v[b, q] = torch.from_numpy(tgt["verb_labels"][b, t])
    eps = 1e-6
    pred = verb_logits.clamp(eps, 1 - eps)
    pos = (target_v == 1).float()
    negm = (target_v < 1).float()
    pos_loss = (pred.log() * (1 - pred) ** 2 * pos).sum()
    neg_loss = ((1 - pred).log() * pred**2 * (1 - target_v) ** 4 * negm).sum()
    loss_verb = -(pos_loss + neg_loss) / pos.sum()

    # box losses
    sub_l1 = 0.0
    obj_l1 = 0.0
    sub_g = 0.0
    obj_g = 0.0
    n_exist = 0.0
    import torch as th

    def giou1(a, b):
        iw = (th.min(a[2], b[2]) - th.max(a[0], b[0])).clamp(min=0)
        ih = (th.min(a[3], b[3]) - th.max(a[1], b[1])).clamp(min=0)
        inter = iw * ih
        union = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        hull = (th.max(a[2], b[2]) - th.min(a[0], b[0])) * (
            th.max(a[3], b[3]) - th.min(a[1], b[1])
        )
        return inter / union - (hull - union) / hull

    def xyxy(v):
        return th.cat([v[:2] - v[2:] / 2, v[:2] + v[2:] / 2])

    for b, (ti, qi) in enumerate(matches):
        for t, q in zip(ti, qi):
            ssb = th.from_numpy(outputs["pred_sub_boxes"][b, q])
            sob = th.from_numpy(outputs["pred_obj_boxes"][b, q])
            tsb = th.from_numpy(tgt["sub_boxes"][b, t])
            tob = th.from_numpy(tgt["obj_boxes"][b, t])
            exist = float((tob != 0).any())
            sub_l1 += (ssb - tsb).abs().sum()
            obj_l1 += (sob - tob).abs().sum() * exist
            sub_g += 1 - giou1(xyxy(ssb), xyxy(tsb))
            obj_g += (1 - giou1(xyxy(sob), xyxy(tob))) * exist
            n_exist += exist

    return {
        "loss_obj_ce": float(loss_obj_ce),
        "loss_verb_ce": float(loss_verb),
        "loss_sub_bbox": float(sub_l1) / num_interactions,
        "loss_obj_bbox": float(obj_l1) / (n_exist + 1e-4),
        "loss_sub_giou": float(sub_g) / num_interactions,
        "loss_obj_giou": float(obj_g) / (n_exist + 1e-4),
    }


def run_ours(outputs, tgt, cfg=None, M_pad=0):
    B, Q, To = outputs["pred_obj_logits"].shape
    _, M, Tv = tgt["verb_labels"].shape
    if M_pad:
        z = np.zeros
        tgt = {
            "obj_labels": np.concatenate([tgt["obj_labels"], z((B, M_pad), np.int64)], 1),
            "verb_labels": np.concatenate([tgt["verb_labels"], z((B, M_pad, Tv), np.float32)], 1),
            "sub_boxes": np.concatenate([tgt["sub_boxes"], z((B, M_pad, 4), np.float32)], 1),
            "obj_boxes": np.concatenate([tgt["obj_boxes"], z((B, M_pad, 4), np.float32)], 1),
        }
    valid = np.ones((B, M + M_pad), bool)
    valid[:, M:] = False
    targets = HOITargets(
        obj_labels=jnp.asarray(tgt["obj_labels"]),
        sub_labels=jnp.zeros((B, M + M_pad), jnp.int32),
        verb_labels=jnp.asarray(tgt["verb_labels"]),
        sub_boxes=jnp.asarray(tgt["sub_boxes"]),
        obj_boxes=jnp.asarray(tgt["obj_boxes"]),
        valid=jnp.asarray(valid),
    )
    def conv(o):
        return {
            k: ([conv(a) for a in v] if k == "aux_outputs" else jnp.asarray(v))
            for k, v in o.items()
        }

    crit = SetCriterionHOI(cfg or LossConfig())
    return crit(
        conv(outputs),
        targets,
        jnp.ones((B, To), bool),
        jnp.ones((B, Tv), bool),
    )


def test_losses_match_torch_reference():
    rng = np.random.RandomState(0)
    outputs, tgt = make_case(rng)
    ours = run_ours(outputs, tgt)
    ref = torch_reference_losses(outputs, tgt)
    for k, v in ref.items():
        assert abs(float(ours[k]) - v) < 2e-3, (k, float(ours[k]), v)


def test_padding_invariance():
    """Adding padded target slots must not change any loss."""
    rng = np.random.RandomState(1)
    outputs, tgt = make_case(rng)
    a = run_ours(outputs, tgt, M_pad=0)
    b = run_ours(outputs, tgt, M_pad=4)
    for k in a:
        assert abs(float(a[k]) - float(b[k])) < 2e-3, (k, float(a[k]), float(b[k]))


def test_aux_losses_present():
    rng = np.random.RandomState(2)
    outputs, tgt = make_case(rng)
    outputs["aux_outputs"] = [
        {k: v + 0.1 for k, v in outputs.items() if k != "aux_outputs"}
    ]
    ours = run_ours(outputs, tgt)
    assert "loss_obj_ce_0" in ours and "loss_verb_ce_0" in ours


def test_giou_soft_labels_and_weighted_total():
    rng = np.random.RandomState(3)
    outputs, tgt = make_case(rng)
    cfg = LossConfig(giou_verb_label=True)
    ours = run_ours(outputs, tgt, cfg=cfg)
    assert np.isfinite(float(ours["loss_verb_ce"]))
    crit = SetCriterionHOI(cfg)
    total = crit.weighted_total({k: jnp.asarray(v) for k, v in ours.items()})
    assert np.isfinite(float(total))


def test_triplet_filtering_runs():
    rng = np.random.RandomState(4)
    outputs, tgt = make_case(rng)
    cfg = LossConfig(triplet_filtering=True)
    ours = run_ours(outputs, tgt, cfg=cfg)
    assert np.isfinite(float(ours["loss_obj_ce"]))
