"""Plain detection path: DETR forward, matcher/criterion, postprocess."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.models.detection import (
    DETRDetector,
    detection_losses,
    postprocess_detection,
)
from test_parseda_forward import tiny_config


def test_detr_forward_and_losses():
    cfg = tiny_config()
    model = DETRDetector(cfg, num_classes=10)
    B, H, W, M = 1, 64, 64, 3
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    params = model.init(jax.random.PRNGKey(0), pixels, valid)
    out = model.apply(params, pixels, valid)
    nq = cfg.num_queries
    assert out["pred_logits"].shape == (B, nq, 11)
    assert out["pred_boxes"].shape == (B, nq, 4)

    labels = jnp.asarray(rng.randint(0, 10, (B, M)))
    boxes = jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32))
    tvalid = jnp.asarray(np.array([[1, 1, 0]], bool))
    losses = detection_losses(out, labels, boxes, tvalid, num_classes=10)
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        assert np.isfinite(float(losses[k])), k
    assert "loss_ce_0" in losses  # aux

    post = postprocess_detection(out, jnp.asarray([[480.0, 640.0]]), top_k=5)
    assert post["scores"].shape == (B, 5)
    assert post["boxes"].shape == (B, 5, 4)
    s = np.asarray(post["scores"][0])
    assert (np.diff(s) <= 1e-6).all()  # sorted descending

    # grads
    def loss_fn(p):
        o = model.apply(p, pixels, valid)
        l = detection_losses(o, labels, boxes, tvalid, num_classes=10)
        return l["loss_ce"] + 5 * l["loss_bbox"] + 2 * l["loss_giou"]

    g = jax.grad(loss_fn)(params)
    gn = sum(float((np.asarray(x) ** 2).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
