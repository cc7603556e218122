"""Segmentation heads (reference models/segmentation.py): mask branch
forward shapes/finiteness, dice + focal mask losses vs hand computation,
and the segm/panoptic postprocessors."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.models.segmentation import (
    DETRSegm,
    dice_loss,
    postprocess_panoptic,
    postprocess_segm,
    sigmoid_focal_loss,
)
from test_parseda_forward import tiny_config


def test_detr_segm_forward():
    cfg = dataclasses.replace(tiny_config(), num_queries=6)
    model = DETRSegm(cfg, num_classes=11)
    rng = np.random.RandomState(0)
    B, H, W = 1, 64, 96
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    params = model.init(jax.random.PRNGKey(0), pixels, valid)
    out = model.apply(params, pixels, valid)
    nq = cfg.num_queries
    assert out["pred_logits"].shape == (B, nq, 12)
    assert out["pred_boxes"].shape == (B, nq, 4)
    # mask at /4 of the padded input
    assert out["pred_masks"].shape == (B, nq, H // 4, W // 4)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_mask_losses():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(3, 50).astype(np.float32))
    targets = jnp.asarray((rng.rand(3, 50) > 0.5).astype(np.float32))
    d = float(dice_loss(logits, targets, 3.0))
    # perfect prediction -> dice ~ 0
    perfect = jnp.where(targets > 0, 20.0, -20.0)
    assert float(dice_loss(perfect, targets, 3.0)) < 1e-3 < d
    f = float(sigmoid_focal_loss(logits, targets, 3.0))
    fp = float(sigmoid_focal_loss(perfect, targets, 3.0))
    assert fp < 1e-6 < f


def test_postprocess_segm_and_panoptic():
    rng = np.random.RandomState(2)
    B, nq, mh, mw = 1, 4, 8, 12
    out = {
        "pred_masks": rng.randn(B, nq, mh, mw).astype(np.float32) * 4,
        "pred_logits": rng.randn(B, nq, 6).astype(np.float32) * 4,
    }
    segs = postprocess_segm(out, [(30, 40)], (32, 48))
    assert segs[0].shape == (nq, 30, 40) and segs[0].dtype == bool

    pano = postprocess_panoptic(out, [(30, 40)], is_thing_map={0: False},
                                threshold=0.0)
    r = pano[0]
    assert r["seg_ids"].shape == (30, 40)
    ids = {s["id"] for s in r["segments_info"]}
    present = set(np.unique(r["seg_ids"])) - {0}
    assert present <= ids
    # areas consistent
    for s in r["segments_info"]:
        assert s["area"] == int((r["seg_ids"] == s["id"]).sum())
