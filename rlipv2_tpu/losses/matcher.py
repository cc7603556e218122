"""Hungarian set matching for HOI triplets — fully on-device.

Capability parity with `HungarianMatcherHOI`
(reference: models/matcher.py:95-270):
  * cost_obj_class / cost_sub_class = -softmax prob at the GT label;
  * cost_verb_class = symmetric BCE-style mean over positive/negative
    verb-label matrices, each normalized by its count (+1e-4)
    (reference :160-163);
  * cost_bbox = elementwise max(L1_sub, L1_obj); obj terms masked where
    the GT object box is all-zero (no-object pair, reference :165-169);
  * cost_giou = max(-GIoU_sub, -GIoU_obj + (-GIoU_sub)·[no obj box])
    (reference :171-177).

TPU-first design: the reference concatenates ragged targets, moves the
cost to CPU and loops scipy `linear_sum_assignment` per image
(reference :182-193). Here targets are padded to a static M, costs are one
batched (B, Q, M) tensor, and the LSAP itself runs on device: a
Jonker-Volgenant shortest-augmenting-path solver written with
`lax.while_loop`, vmapped over the batch. Padded target rows get constant
cost, which provably never changes the optimum of the real rows (a
constant row contributes the same total whichever column it takes).
O(M^2 Q) — microseconds at M=64, Q=200, and no host round-trip.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rlipv2_tpu.ops.boxes import box_cxcywh_to_xyxy, generalized_box_iou
from rlipv2_tpu.structures import HOITargets

INF = 1e9


class MatchCosts(NamedTuple):
    total: jnp.ndarray  # (B, Q, M) combined weighted cost
    giou: jnp.ndarray  # (B, Q, M) max-combined giou cost
    sub_giou: jnp.ndarray
    obj_giou: jnp.ndarray
    bbox: jnp.ndarray
    verb_class: jnp.ndarray
    obj_class: jnp.ndarray
    sub_class: jnp.ndarray  # zeros when subject_class=False


def hoi_matching_costs(
    outputs: dict,
    targets: HOITargets,
    verb_valid: jnp.ndarray,  # (B, T_verb) bool: real verb text slots
    cost_obj_class: float = 1.0,
    cost_verb_class: float = 1.0,
    cost_bbox: float = 2.5,
    cost_giou: float = 1.0,
    subject_class: bool = False,
) -> MatchCosts:
    obj_logits = outputs["pred_obj_logits"].astype(jnp.float32)  # (B, Q, To)
    verb_logits = outputs["pred_verb_logits"].astype(jnp.float32)  # (B, Q, Tv)
    sub_bbox = outputs["pred_sub_boxes"].astype(jnp.float32)  # (B, Q, 4)
    obj_bbox = outputs["pred_obj_boxes"].astype(jnp.float32)

    obj_prob = jax.nn.softmax(obj_logits, axis=-1)
    verb_prob = jax.nn.sigmoid(verb_logits)

    # class costs: gather prob at GT label per (query, target)
    c_obj = -jnp.take_along_axis(
        obj_prob[:, :, None, :],
        targets.obj_labels[:, None, :, None].astype(jnp.int32),
        axis=-1,
    )[..., 0]  # (B, Q, M)
    if subject_class:
        sub_prob = jax.nn.softmax(outputs["pred_sub_logits"].astype(jnp.float32), -1)
        c_sub = -jnp.take_along_axis(
            sub_prob[:, :, None, :],
            targets.sub_labels[:, None, :, None].astype(jnp.int32),
            axis=-1,
        )[..., 0]
    else:
        c_sub = jnp.zeros_like(c_obj)

    # verb cost: symmetric pos/neg BCE-style; padded verb TEXT slots are
    # excluded from both terms (the reference has no padded slots)
    T = targets.verb_labels.astype(jnp.float32)  # (B, M, Tv)
    vmask = verb_valid.astype(jnp.float32)[:, None, :]  # (B, 1, Tv)
    Tpos = T * vmask
    Tneg = (1.0 - T) * vmask
    pos = jnp.einsum("bqv,bmv->bqm", verb_prob, Tpos) / (
        Tpos.sum(-1)[:, None, :] + 1e-4
    )
    neg = jnp.einsum("bqv,bmv->bqm", 1.0 - verb_prob, Tneg) / (
        Tneg.sum(-1)[:, None, :] + 1e-4
    )
    c_verb = -(pos + neg) / 2.0

    # box costs
    l1_sub = jnp.abs(sub_bbox[:, :, None, :] - targets.sub_boxes[:, None]).sum(-1)
    l1_obj = jnp.abs(obj_bbox[:, :, None, :] - targets.obj_boxes[:, None]).sum(-1)
    exist_obj = jnp.any(targets.obj_boxes != 0, axis=-1)  # (B, M)
    l1_obj = l1_obj * exist_obj[:, None, :]
    c_bbox = jnp.maximum(l1_sub, l1_obj)

    g_sub = -generalized_box_iou(
        box_cxcywh_to_xyxy(sub_bbox), box_cxcywh_to_xyxy(targets.sub_boxes)
    )
    g_obj = -generalized_box_iou(
        box_cxcywh_to_xyxy(obj_bbox), box_cxcywh_to_xyxy(targets.obj_boxes)
    )
    g_obj = g_obj + g_sub * (~exist_obj)[:, None, :]
    c_giou = jnp.maximum(g_sub, g_obj)

    total = (
        cost_obj_class * c_obj
        + cost_obj_class * c_sub * subject_class
        + cost_verb_class * c_verb
        + cost_bbox * c_bbox
        + cost_giou * c_giou
    )
    # padded target slots -> constant 0 (does not perturb the optimum)
    total = jnp.where(targets.valid[:, None, :], total, 0.0)
    return MatchCosts(total, c_giou, g_sub, g_obj, c_bbox, c_verb, c_obj, c_sub)


def lsap_jax(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact linear sum assignment, rows -> columns, n_rows <= n_cols.

    Jonker-Volgenant shortest augmenting path with potentials (the
    classical O(n^2 m) formulation). Returns (n_rows,) int32 column index
    assigned to each row. Device-resident; safe under vmap/jit.
    """
    n, m = cost.shape
    cost = cost.astype(jnp.float32)

    u0 = jnp.zeros(n + 1, jnp.float32)
    v0 = jnp.zeros(m + 1, jnp.float32)
    p0 = jnp.zeros(m + 1, jnp.int32)  # p[j] = row (1-indexed) on column j

    def assign_row(carry, i):
        u, v, p = carry
        i1 = i + 1  # 1-indexed row
        p = p.at[0].set(i1)

        minv0 = jnp.full(m + 1, INF, jnp.float32)
        used0 = jnp.zeros(m + 1, bool)
        way0 = jnp.zeros(m + 1, jnp.int32)

        def cond(state):
            u, v, p, minv, used, way, j0 = state
            return p[j0] != 0

        def body(state):
            u, v, p, minv, used, way, j0 = state
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = cost[i0 - 1, :] - u[i0] - v[1:]  # (m,)
            notused = ~used[1:]
            take = (cur < minv[1:]) & notused
            minv = minv.at[1:].set(jnp.where(take, cur, minv[1:]))
            way = way.at[1:].set(jnp.where(take, j0, way[1:]))
            masked = jnp.where(notused, minv[1:], INF)
            j1 = jnp.argmin(masked).astype(jnp.int32) + 1
            delta = masked[j1 - 1]
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = v - jnp.where(used, delta, 0.0)
            minv = minv.at[1:].set(
                jnp.where(notused, minv[1:] - delta, minv[1:])
            )
            return (u, v, p, minv, used, way, j1)

        # do-while: p[0] = i1 != 0, so the body always runs at least once
        u, v, p, minv, used, way, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv0, used0, way0, jnp.int32(0))
        )

        # augment along the alternating path
        def aug_cond(state):
            p, j0 = state
            return j0 != 0

        def aug_body(state):
            p, j0 = state
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return (p, j1)

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return (u, v, p), None

    (u, v, p), _ = jax.lax.scan(assign_row, (u0, v0, p0), jnp.arange(n))

    # invert p: row -> column
    cols = jnp.arange(1, m + 1, dtype=jnp.int32)
    row_of_col = p[1:]  # (m,) 0 = unassigned
    ans = jnp.zeros(n, jnp.int32)
    ans = ans.at[jnp.where(row_of_col > 0, row_of_col - 1, n)].set(
        cols - 1, mode="drop"
    )
    return ans


@functools.partial(jax.jit, static_argnames=())
def hungarian_match(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched LSAP: cost (B, Q, M) -> (B, M) query index per target slot.

    Rows are target slots (M <= Q required)."""
    B, Q, M = cost.shape
    assert M <= Q, f"need M ({M}) <= Q ({Q})"
    return jax.vmap(lsap_jax)(jnp.swapaxes(cost, 1, 2))  # rows=targets
