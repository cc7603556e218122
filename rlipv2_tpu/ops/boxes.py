"""Box utilities (pure jnp, fully batched, static shapes).

Capability parity with the reference's ``util/box_ops.py`` (reference:
util/box_ops.py:10-88): cxcywh<->xyxy conversion, pairwise IoU and
generalized IoU. Everything here is shape-polymorphic over leading batch
dims and safe under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [cx, cy, w, h] -> [x0, y0, x1, y1]."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x0, y0, x1, y1] -> [cx, cy, w, h]."""
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, (..., 4) -> (...)."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise IoU of xyxy boxes.

    a: (..., N, 4), b: (..., M, 4) -> iou, union each (..., N, M).
    """
    area_a = box_area(a)  # (..., N)
    area_b = box_area(b)  # (..., M)

    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])  # (..., N, M, 2)
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # (..., N, M)

    union = area_a[..., :, None] + area_b[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes: (..., N, 4) x (..., M, 4) -> (..., N, M).

    Degenerate (x1 < x0) boxes are the caller's responsibility, as in the
    reference; we do not assert under jit.
    """
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)
