"""Static-shape data contracts.

The reference uses ragged per-image target dicts and a NestedTensor batch
(reference: util/misc.py:284-341). For XLA, everything is padded to static
shapes with validity masks:

  * images pad to bucketed (H, W) with a pixel-validity mask;
  * GT triplets pad to `max_triplets` slots with `valid`;
  * label texts pad to (max_obj_texts, max_verb_texts) slots with masks,
    and the no-object text ALWAYS occupies the last object slot, keeping
    the reference's "last column = no-object" convention
    (reference: models/hoi.py:3842-3845, 4830-4832) static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ImageBatch(NamedTuple):
    pixels: jnp.ndarray  # (B, H, W, 3) float32, normalized
    valid: jnp.ndarray  # (B, H, W) bool, True = real pixel


class TextBatch(NamedTuple):
    """Pooled per-label text features arranged into static slots."""

    embeddings: jnp.ndarray  # (B, T_obj + T_verb, l_dim)
    valid: jnp.ndarray  # (B, T_obj + T_verb) bool


class HOITargets(NamedTuple):
    """Padded GT triplets. All arrays have leading (B, M)."""

    obj_labels: jnp.ndarray  # (B, M) int32, index into obj text slots
    sub_labels: jnp.ndarray  # (B, M) int32 (subject_class mode; else zeros)
    verb_labels: jnp.ndarray  # (B, M, T_verb) float multi-hot
    sub_boxes: jnp.ndarray  # (B, M, 4) normalized cxcywh
    obj_boxes: jnp.ndarray  # (B, M, 4); all-zero => "no object box" pair
    valid: jnp.ndarray  # (B, M) bool, True = real triplet
