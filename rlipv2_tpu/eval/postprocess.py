"""Post-processing of model outputs into detection results.

Capability parity with `PostProcessHOI` (reference: models/hoi.py:4769-4873)
and `PostProcessSGG` (:4876-4938):
  * object scores = softmax over text slots with the LAST slot dropped as
    no-object; per-query (score, label) = max over remaining slots;
  * verb scores = sigmoid (optionally raw / temperature-scaled);
  * boxes cxcywh -> xyxy scaled to the ORIGINAL image size;
  * final verb score multiplied by the object score (SGG: also subject);
  * pairs are (query i subject, query i object) with ids [0..nq) and
    [nq..2nq);
  * zero-shot HOI eval filters pairs whose predicted subject is not the
    subject category (reference :4803-4817) — returned as a mask, applied
    host-side.

TPU-first: the whole step is one jitted batched function returning
fixed-shape arrays; the reference loops per image on CPU. Invalid (padded)
text slots are masked to -inf/0 before the reductions.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from rlipv2_tpu.ops.boxes import box_cxcywh_to_xyxy

NEG = -1e9


def load_cooccurrence_prior(path) -> "jnp.ndarray":
    """Load + smooth the object-verb co-occurrence prior
    (reference: models/hoi.py:4787-4792 — `cond_prob_co_matrices` from
    datasets/priors/obj_verb_cooccurrence.npz, additive 0.1/V smoothing,
    row-normalized). Returns (n_obj, V)."""
    import numpy as np

    co = np.load(path)["cond_prob_co_matrices"].astype(np.float32)
    co = co + 0.1 / co.shape[1]
    return jnp.asarray(co / co.sum(axis=1, keepdims=True))


@functools.partial(
    jax.jit,
    static_argnames=("use_sigmoid", "subject_class", "temperature", "verb_curing"),
)
def postprocess_hoi(
    outputs: dict,
    orig_sizes: jnp.ndarray,  # (B, 2) as (h, w)
    obj_valid: Optional[jnp.ndarray] = None,  # (B, T_obj) real slots
    verb_valid: Optional[jnp.ndarray] = None,  # (B, T_verb)
    use_sigmoid: bool = True,
    subject_class: bool = False,
    temperature: Optional[float] = None,
    verb_curing: bool = False,
    obj_verb_cooccurrence: Optional[jnp.ndarray] = None,  # (n_obj-1, V)
) -> dict:
    """Returns a dict of batched arrays:
    obj_scores/obj_labels (B, nq), verb_scores (B, nq, V),
    sub_boxes/obj_boxes (B, nq, 4) xyxy in original pixels,
    sub_label_mask (B, nq) bool (True = keep; all True unless subject_class).

    verb_curing multiplies sigmoid verb scores by the model's pair-quality
    `curing_score` (reference: models/hoi.py:4833-4836); when
    `obj_verb_cooccurrence` is given, the final verb score uses the
    object-conditional verb prior `obj_prob @ co` instead of the flat
    object score (reference: models/hoi.py:4866-4869, the
    `obj_verb_cooccurrence.npz` alternation — load with
    `load_cooccurrence_prior`)."""
    obj_logits = outputs["pred_obj_logits"].astype(jnp.float32)
    verb_logits = outputs["pred_verb_logits"].astype(jnp.float32)
    if temperature:
        obj_logits = obj_logits / temperature

    if obj_valid is not None:
        obj_logits = jnp.where(obj_valid[:, None, :], obj_logits, NEG)
    obj_prob = jax.nn.softmax(obj_logits, axis=-1)
    # drop the final (no-object) slot — with padding, the no-object text is
    # pinned to the LAST static slot, so [:-1] keeps reference semantics,
    # and padded slots carry ~0 probability from the masked softmax.
    obj_prob_fg = obj_prob[..., :-1]
    obj_scores = obj_prob_fg.max(-1)
    obj_labels = obj_prob_fg.argmax(-1)

    verb_scores = jax.nn.sigmoid(verb_logits) if use_sigmoid else verb_logits
    if verb_curing and "curing_score" in outputs:
        verb_scores = verb_scores * outputs["curing_score"].astype(jnp.float32)
    if verb_valid is not None:
        verb_scores = verb_scores * verb_valid[:, None, :]
    if obj_verb_cooccurrence is not None:
        verb_scores = verb_scores * jnp.einsum(
            "bqo,ov->bqv", obj_prob_fg, obj_verb_cooccurrence.astype(jnp.float32)
        )
    else:
        verb_scores = verb_scores * obj_scores[..., None]

    h, w = orig_sizes[:, 0], orig_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=1).astype(jnp.float32)[:, None, :]
    sub_boxes = box_cxcywh_to_xyxy(outputs["pred_sub_boxes"].astype(jnp.float32)) * scale
    obj_boxes = box_cxcywh_to_xyxy(outputs["pred_obj_boxes"].astype(jnp.float32)) * scale

    result = {
        "obj_scores": obj_scores,
        "obj_labels": obj_labels,
        "verb_scores": verb_scores,
        "sub_boxes": sub_boxes,
        "obj_boxes": obj_boxes,
    }
    if subject_class and "pred_sub_logits" in outputs:
        sub_logits = outputs["pred_sub_logits"].astype(jnp.float32)
        if temperature:
            sub_logits = sub_logits / temperature
        if obj_valid is not None:
            sub_logits = jnp.where(obj_valid[:, None, :], sub_logits, NEG)
        sub_prob = jax.nn.softmax(sub_logits, axis=-1)[..., :-1]
        result["sub_scores"] = sub_prob.max(-1)
        result["sub_labels"] = sub_prob.argmax(-1)
    return result


@functools.partial(jax.jit, static_argnames=("use_sigmoid",))
def postprocess_sgg(
    outputs: dict,
    orig_sizes: jnp.ndarray,
    obj_valid: Optional[jnp.ndarray] = None,
    verb_valid: Optional[jnp.ndarray] = None,
    use_sigmoid: bool = True,
) -> dict:
    """SGG variant: relation scores *= obj_score * sub_score (reference:
    models/hoi.py:4876-4938)."""
    base = postprocess_hoi(
        outputs,
        orig_sizes,
        obj_valid,
        verb_valid,
        use_sigmoid=use_sigmoid,
        subject_class=True,
    )
    base["verb_scores"] = base["verb_scores"] * base["sub_scores"][..., None]
    return base


def to_image_results(
    batched: dict, subject_category_id: int = 0, zero_shot_subject_filter: bool = False
):
    """Host-side conversion into the reference's per-image result dicts
    (labels/boxes concat [sub || obj], verb_scores, sub/obj ids) consumed by
    the evaluators (reference: models/hoi.py:4849-4871)."""
    import numpy as np

    B, nq = np.asarray(batched["obj_scores"]).shape
    out = []
    for b in range(B):
        ol = np.asarray(batched["obj_labels"][b])
        os_ = np.asarray(batched["obj_scores"][b])
        vs = np.asarray(batched["verb_scores"][b])
        sb = np.asarray(batched["sub_boxes"][b])
        ob = np.asarray(batched["obj_boxes"][b])
        keep = np.ones(nq, dtype=bool)
        if zero_shot_subject_filter and "sub_labels" in batched:
            keep = np.asarray(batched["sub_labels"][b]) == subject_category_id
        ol, os_, vs, sb, ob = ol[keep], os_[keep], vs[keep], sb[keep], ob[keep]
        n = len(ol)
        sl = np.full(n, subject_category_id, dtype=np.int64)
        labels = np.concatenate([sl, ol])
        boxes = np.concatenate([sb, ob], axis=0)
        ids = np.arange(2 * n)
        out.append(
            {
                "labels": labels,
                "boxes": boxes,
                "verb_scores": vs,
                "sub_ids": ids[:n],
                "obj_ids": ids[n:],
            }
        )
    return out
