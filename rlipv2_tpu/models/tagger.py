"""R-Tagger: RLIP run as a relation tagger over ground-truth boxes.

Capability parity with the reference's verb-tagger machinery:
  * prepare_query (reference: models/verb_tagger_helper.py:10-140):
    GT (sub, obj) pairs become DN-DETR-style noised queries — box noise
    scaled by box size then clamped to [0,1], label noise flipping labels
    to random classes, query = box embedding + label text embedding,
    padded pair slots masked (with the all-empty guard keeping slot 0
    attended);
  * tagger forward (reference: models/ParSetransformer.py:507-518,755-767):
    the decoders consume the noised GT queries instead of learned ones —
    in this DAB rebuild the noised GT boxes ARE the 4-d anchors;
  * loss_verb_tagger (reference: models/hoi.py:4036-4118): slot-aligned
    reconstruction (no Hungarian matching) — box L1+GIoU, sub/obj CE with
    eos down-weighting, verb BCE/focal over candidate relation texts.

Static shapes: pairs pad to num_queries//2 slots with a validity mask, so
the noised-query assembly is masked arithmetic instead of per-image
ragged concatenation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rlipv2_tpu.ops.positional import inverse_sigmoid
from rlipv2_tpu.structures import HOITargets


def noise_boxes(boxes: jnp.ndarray, rng: jnp.ndarray, scale: float) -> jnp.ndarray:
    """(..., 4) cxcywh in [0,1]: jitter centers by +-w/2*scale etc."""
    if scale <= 0:
        return boxes
    diff = jnp.concatenate([boxes[..., 2:] / 2, boxes[..., 2:]], axis=-1)
    noise = jax.random.uniform(rng, boxes.shape, minval=-1.0, maxval=1.0)
    return jnp.clip(boxes + noise * diff * scale, 0.0, 1.0)


def noise_labels(
    labels: jnp.ndarray, rng: jnp.ndarray, scale: float, num_classes: jnp.ndarray
) -> jnp.ndarray:
    """Flip each label to a random class with prob `scale`."""
    if scale <= 0:
        return labels
    r1, r2 = jax.random.split(rng)
    flip = jax.random.uniform(r1, labels.shape) < scale
    rand = jax.random.randint(r2, labels.shape, 0, num_classes)
    return jnp.where(flip, rand, labels)


def prepare_tagger_queries(
    label_embeds: jnp.ndarray,  # (B, T_obj, C) resized text features
    targets: HOITargets,  # boxes cxcywh normalized; M = num_queries // 2
    rng: jnp.ndarray,
    box_noise_scale: float = 0.4,
    label_noise_scale: float = 0.2,
    n_valid_classes: int | None = None,
    training: bool = True,
):
    """Returns (sub_ref, obj_ref, sub_label_q, obj_label_q, slot_valid):
    refs (B, M, 4) noised anchors; label queries (B, M, C) gathered text
    features; slot_valid (B, M) with the empty-image guard on slot 0."""
    B, M = targets.valid.shape
    n_cls = (
        label_embeds.shape[1] if n_valid_classes is None else n_valid_classes
    )

    r_sb, r_ob, r_sl, r_ol = jax.random.split(rng, 4)
    sub_boxes, obj_boxes = targets.sub_boxes, targets.obj_boxes
    sub_labels, obj_labels = targets.sub_labels, targets.obj_labels
    if training:
        sub_boxes = noise_boxes(sub_boxes, r_sb, box_noise_scale)
        obj_boxes = noise_boxes(obj_boxes, r_ob, box_noise_scale)
        sub_labels = noise_labels(sub_labels, r_sl, label_noise_scale, n_cls)
        obj_labels = noise_labels(obj_labels, r_ol, label_noise_scale, n_cls)

    bidx = jnp.arange(B)[:, None]
    sub_label_q = label_embeds[bidx, sub_labels]  # (B, M, C)
    obj_label_q = label_embeds[bidx, obj_labels]

    valid = targets.valid
    # empty-image guard (reference verb_tagger_helper.py:99-110): leave
    # slot 0 attended so attention softmaxes stay finite
    any_valid = valid.any(axis=1, keepdims=True)
    slot_valid = valid | (~any_valid & (jnp.arange(M) == 0))

    zero = jnp.zeros_like(sub_label_q)
    sub_label_q = jnp.where(valid[..., None], sub_label_q, zero)
    obj_label_q = jnp.where(valid[..., None], obj_label_q, zero)
    # padded slots get a neutral centered anchor
    default_box = jnp.asarray([0.5, 0.5, 0.5, 0.5], sub_boxes.dtype)
    sub_ref = jnp.where(valid[..., None], sub_boxes, default_box)
    obj_ref = jnp.where(valid[..., None], obj_boxes, default_box)
    return sub_ref, obj_ref, sub_label_q, obj_label_q, slot_valid


def tagger_box_queries(coord_proj_apply, sub_ref, obj_ref):
    """Box part of the noised query: Dense(inverse_sigmoid(box)) — the
    reference's coord_proj (models/ParSetransformer.py:507-518)."""
    return (
        coord_proj_apply(inverse_sigmoid(sub_ref)),
        coord_proj_apply(inverse_sigmoid(obj_ref)),
    )
