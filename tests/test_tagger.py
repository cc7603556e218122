"""R-Tagger: noised-query preparation, tagger forward, reconstruction loss."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.config import LossConfig
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.models.parseda import RLIPParSeDA
from rlipv2_tpu.models.tagger import noise_boxes, noise_labels, prepare_tagger_queries
from rlipv2_tpu.structures import HOITargets
from test_parseda_forward import tiny_config


def make_targets(rng, B, M, Tv, valid_counts):
    valid = np.zeros((B, M), bool)
    for b, n in enumerate(valid_counts):
        valid[b, :n] = True
    return HOITargets(
        obj_labels=jnp.asarray(rng.randint(0, 3, (B, M))),
        sub_labels=jnp.zeros((B, M), jnp.int32),
        verb_labels=jnp.asarray((rng.rand(B, M, Tv) > 0.5).astype(np.float32)),
        sub_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        obj_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        valid=jnp.asarray(valid),
    )


def test_noise_bounds():
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (4, 6, 4)).astype(np.float32))
    noised = noise_boxes(boxes, jax.random.PRNGKey(0), 0.4)
    a = np.asarray(noised)
    assert (a >= 0).all() and (a <= 1).all()
    assert not np.allclose(a, np.asarray(boxes))

    labels = jnp.asarray(rng.randint(0, 5, (4, 6)))
    nl = noise_labels(labels, jax.random.PRNGKey(1), 0.5, 5)
    assert (np.asarray(nl) < 5).all() and (np.asarray(nl) >= 0).all()
    assert (np.asarray(nl) != np.asarray(labels)).any()


def test_prepare_queries_masks_and_guard():
    rng = np.random.RandomState(1)
    B, M, C = 3, 4, 16
    targets = make_targets(rng, B, M, 5, [2, 0, 4])  # image 1 has NO pairs
    label_embeds = jnp.asarray(rng.randn(B, 6, C).astype(np.float32))
    sub_ref, obj_ref, sub_lq, obj_lq, slot_valid = prepare_tagger_queries(
        label_embeds, targets, jax.random.PRNGKey(0), 0.2, 0.2
    )
    sv = np.asarray(slot_valid)
    assert sv[0, :2].all() and not sv[0, 2:].any()
    assert sv[1, 0] and not sv[1, 1:].any()  # empty-image guard on slot 0
    # padded slots: zero label queries, neutral anchors
    assert (np.asarray(sub_lq)[0, 2:] == 0).all()
    np.testing.assert_allclose(np.asarray(sub_ref)[0, 3], [0.5, 0.5, 0.5, 0.5])


def test_tagger_forward_and_loss():
    cfg = dataclasses.replace(tiny_config(), subject_class=True)
    model = RLIPParSeDA(cfg)
    B, H, W = 2, 64, 64
    M = cfg.num_queries // 2
    Tv = cfg.max_verb_texts
    rng = np.random.RandomState(2)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    text = jnp.asarray(rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32))
    tv = jnp.ones((B, T), bool)
    targets = make_targets(rng, B, M, Tv, [3, 1])

    params = model.init(
        jax.random.PRNGKey(0),
        pixels, valid, text, tv, targets, jax.random.PRNGKey(1),
        cfg.max_obj_texts,
        method=RLIPParSeDA.forward_tagger,
    )
    out = model.apply(
        params, pixels, valid, text, tv, targets, jax.random.PRNGKey(2),
        cfg.max_obj_texts,
        method=RLIPParSeDA.forward_tagger,
    )
    assert out["pred_verb_logits"].shape == (B, M, Tv)
    assert out["pred_sub_logits"].shape[2] == cfg.max_obj_texts
    assert "tagger_slot_valid" in out

    crit = SetCriterionHOI(LossConfig(verb_loss_type="bce"), subject_class=True)
    losses = crit.tagger_losses(
        out, targets, jnp.ones((B, cfg.max_obj_texts), bool),
        jnp.ones((B, Tv), bool),
    )
    for k, val in losses.items():
        assert np.isfinite(float(val)), k

    # gradient flows through the tagger path
    def loss_fn(p):
        o = model.apply(
            p, pixels, valid, text, tv, targets, jax.random.PRNGKey(2),
            cfg.max_obj_texts, method=RLIPParSeDA.forward_tagger,
        )
        l = crit.tagger_losses(
            o, targets, jnp.ones((B, cfg.max_obj_texts), bool),
            jnp.ones((B, Tv), bool),
        )
        return crit.weighted_total(l)

    g = jax.grad(loss_fn)(params)
    gn = sum(float((np.asarray(x) ** 2).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
