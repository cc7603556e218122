"""The round-2 loss/head additions: cross-modal contrastive align, masked
entity modeling, verb curing, weighted/asymmetric/CB-focal verb losses,
exponential aux decay, online pseudo-verb, co-occurrence prior.

Each semantic check replicates the reference formula in plain numpy with
reference line citations (models/hoi.py, models/detr.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.config import LossConfig
from rlipv2_tpu.losses.criterion import SetCriterionHOI
from rlipv2_tpu.structures import HOITargets


def make_case(seed=0, B=2, Q=6, M=3, To=5, Tv=4):
    rng = np.random.RandomState(seed)
    outputs = {
        "pred_obj_logits": jnp.asarray(rng.randn(B, Q, To).astype(np.float32)),
        "pred_sub_logits": jnp.asarray(rng.randn(B, Q, To).astype(np.float32)),
        "pred_verb_logits": jnp.asarray(rng.randn(B, Q, Tv).astype(np.float32)),
        "pred_sub_boxes": jnp.asarray(
            rng.uniform(0.3, 0.6, (B, Q, 4)).astype(np.float32)
        ),
        "pred_obj_boxes": jnp.asarray(
            rng.uniform(0.3, 0.6, (B, Q, 4)).astype(np.float32)
        ),
    }
    targets = HOITargets(
        obj_labels=jnp.asarray(rng.randint(0, To - 1, (B, M))),
        sub_labels=jnp.asarray(rng.randint(0, To - 1, (B, M))),
        verb_labels=jnp.asarray(
            (rng.rand(B, M, Tv - 1) > 0.5).astype(np.float32)
        ),
        sub_boxes=jnp.asarray(rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32)),
        obj_boxes=jnp.asarray(rng.uniform(0.3, 0.6, (B, M, 4)).astype(np.float32)),
        valid=jnp.asarray([[True, True, False], [True, False, False]]),
    )
    # pad verb labels to Tv with a zero no-verb column (last slot)
    targets = targets._replace(
        verb_labels=jnp.concatenate(
            [targets.verb_labels, jnp.zeros((B, M, 1))], axis=-1
        )
    )
    obj_valid = jnp.ones((B, To), bool)
    verb_valid = jnp.ones((B, Tv), bool)
    return outputs, targets, obj_valid, verb_valid


def ref_contrastive(logits, pos_map, symmetric, tau=0.07):
    """Reference formula (models/hoi.py:4583-4619) in numpy."""
    logits = np.asarray(logits, np.float64) / tau
    pos = np.asarray(pos_map, bool)
    pos_logits = np.where(pos, -logits, 0.0)

    def one_way(axis):
        with_pos = pos.any(axis)
        pos_term = pos_logits.sum(axis)
        m = logits.max(axis)
        neg_term = np.log(np.exp(logits - np.expand_dims(m, axis)).sum(axis)) + m
        num_pos = pos.sum(axis) + 1e-6
        return np.where(with_pos, pos_term / num_pos + neg_term, 0.0).sum()

    v2t = one_way(2)
    if not symmetric:
        return v2t
    return (v2t + one_way(1)) / 2.0


@pytest.mark.parametrize("symmetric", [True, False])
def test_contrastive_align_matches_reference_formula(symmetric):
    outputs, targets, obj_valid, verb_valid = make_case()
    cfg = LossConfig(
        obj_loss_type="cross_modal_matching",
        verb_loss_type="cross_modal_matching",
        matching_symmetric=symmetric,
    )
    crit = SetCriterionHOI(cfg, subject_class=True)
    losses = crit(outputs, targets, obj_valid, verb_valid)
    assert {"loss_obj_matching", "loss_sub_matching", "loss_verb_matching"} <= set(
        losses
    )

    # rebuild the positive maps exactly as the reference does and compare
    from rlipv2_tpu.losses.matcher import hoi_matching_costs, hungarian_match

    costs = hoi_matching_costs(
        outputs, targets, verb_valid, subject_class=True
    )
    match = np.asarray(hungarian_match(costs.total))
    B, Q, To = outputs["pred_obj_logits"].shape
    Tv = outputs["pred_verb_logits"].shape[-1]
    valid = np.asarray(targets.valid)

    def build_pos(labels_or_rows, T, multihot=False):
        pos = np.zeros((B, Q, T), bool)
        pos[:, :, T - 1] = True
        for b in range(B):
            for m in range(valid.shape[1]):
                if valid[b, m]:
                    row = np.zeros(T, bool)
                    if multihot:
                        row[:] = np.asarray(labels_or_rows)[b, m] > 0
                        row[T - 1] = False
                    else:
                        row[int(np.asarray(labels_or_rows)[b, m])] = True
                    pos[b, match[b, m]] = row
        return pos

    exp_obj = ref_contrastive(
        outputs["pred_obj_logits"], build_pos(targets.obj_labels, To), symmetric
    )
    exp_verb = ref_contrastive(
        outputs["pred_verb_logits"],
        build_pos(targets.verb_labels, Tv, multihot=True),
        symmetric,
    )
    np.testing.assert_allclose(float(losses["loss_obj_matching"]), exp_obj, rtol=2e-5)
    np.testing.assert_allclose(float(losses["loss_verb_matching"]), exp_verb, rtol=2e-5)


def test_verb_bce_variants_match_reference_formulas():
    """weighted_bce (models/hoi.py:4353-4375), asymmetric_bce (:4405-4434),
    CB_focal_bce (:4377-4403) on fully-valid slots."""
    rng = np.random.RandomState(3)
    B, Q, Tv = 2, 5, 4
    pred = rng.uniform(0.05, 0.95, (B, Q, Tv)).astype(np.float32)
    gt = (rng.rand(B, Q, Tv) > 0.6).astype(np.float32)
    valid = jnp.ones((B, Tv), bool)
    nw = rng.uniform(0.2, 1.0, (Tv,)).astype(np.float32)
    counts = rng.randint(5, 500, (Tv,)).astype(np.float32)

    crit = SetCriterionHOI(
        LossConfig(), verb_neg_weights=jnp.asarray(nw),
        verb_sample_counts=jnp.asarray(counts),
    )
    eps = 1e-6
    pos = (gt == 1).astype(np.float64)
    neg = (gt < 1).astype(np.float64)
    p = np.clip(pred, eps, 1 - eps).astype(np.float64)

    # weighted_bce
    exp = -(
        (np.log(p) * pos).sum() + (np.log(1 - p) * nw * neg).sum()
    ) / pos.sum()
    got = float(crit._weighted_bce(jnp.asarray(pred), jnp.asarray(gt), valid))
    np.testing.assert_allclose(got, exp, rtol=1e-5)

    # asymmetric_bce (gamma_pos 0, gamma_neg 3, m 0.01)
    p_p = np.clip(pred, eps, 1.0).astype(np.float64)
    p_m = np.clip(pred - 0.01, 0.0, 1 - eps).astype(np.float64)
    exp = -(
        (np.log(p_p) * pos).sum()
        + (np.log(1 - p_m) * p_m**3 * (1 - gt) ** 4 * neg).sum()
    ) / pos.sum()
    got = float(crit._asymmetric_bce(jnp.asarray(pred), jnp.asarray(gt), valid))
    np.testing.assert_allclose(got, exp, rtol=1e-5)

    # CB_focal_bce (gamma 2, alpha .5, vol 2, beta .9999)
    beta = 0.9999
    bw = (1 - beta) / (1 - beta**counts)
    exp = -(
        (np.log(p) * (1 - p) ** 2 * 0.5 * 2 * pos * bw).sum()
        + (np.log(1 - p) * p**2 * (1 - gt) ** 4 * 0.5 * 2 * neg * bw).sum()
    ) / pos.sum()
    got = float(crit._cb_focal_bce(jnp.asarray(pred), jnp.asarray(gt), valid))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_exponential_aux_decay():
    """weight_dict aux decay: hyper^(dec_layers-1-i) on the six core coefs
    (models/detr.py:608-621)."""
    cfg = LossConfig(exponential_loss=True, exponential_hyper=0.8)
    crit = SetCriterionHOI(cfg)
    losses = {
        "loss_verb_ce": jnp.asarray(1.0),
        "loss_verb_ce_0": jnp.asarray(1.0),
        "loss_verb_ce_1": jnp.asarray(1.0),
    }
    # dec_layers = 3; layer 0 -> 0.8^2, layer 1 -> 0.8^1, final -> 1.0
    got = float(crit.weighted_total(losses))
    np.testing.assert_allclose(got, 1.0 + 0.8**2 + 0.8, rtol=1e-6)
    # flag off: plain sum
    crit2 = SetCriterionHOI(LossConfig())
    np.testing.assert_allclose(float(crit2.weighted_total(losses)), 3.0)


def test_recon_losses_and_curing_in_criterion():
    outputs, targets, obj_valid, verb_valid = make_case(seed=5)
    B, Q, Tv = outputs["pred_verb_logits"].shape
    outputs["curing_score"] = jnp.asarray(
        np.random.RandomState(0).uniform(0.2, 0.9, (B, Q, 1)).astype(np.float32)
    )
    outputs["recon_stat"] = {
        k: outputs[k] + 0.1
        for k in ["pred_sub_logits", "pred_obj_logits", "pred_sub_boxes", "pred_obj_boxes"]
    }
    crit = SetCriterionHOI(LossConfig(masked_loss_coef=0.5), subject_class=True)
    losses = crit(outputs, targets, obj_valid, verb_valid)
    for k in ["loss_obj_ce_recon", "loss_sub_bbox_recon", "loss_obj_giou_recon"]:
        assert k in losses and np.isfinite(float(losses[k]))
    total = float(crit.weighted_total(losses))
    assert np.isfinite(total)

    # curing changes the focal verb loss (pred *= curing inside)
    no_cure = {k: v for k, v in outputs.items() if k != "curing_score"}
    l2 = crit(no_cure, targets, obj_valid, verb_valid)
    assert float(l2["loss_verb_ce"]) != pytest.approx(float(losses["loss_verb_ce"]))


def test_pseudo_verb_metrics():
    from rlipv2_tpu.losses.pseudo_verb import pseudo_verb_similarity

    rng = np.random.RandomState(1)
    Tv, D, B, M = 5, 8, 2, 3
    feats = jnp.asarray(rng.randn(Tv, D).astype(np.float32))
    labels = jnp.asarray((rng.rand(B, M, Tv) > 0.6).astype(np.float32))
    valid = jnp.ones((Tv,), bool)
    for metric in ["euclidean", "cosine"]:
        tvs = pseudo_verb_similarity(feats, labels, valid, metric=metric)
        tvs = np.asarray(tvs)
        assert tvs.shape == (B, M, Tv)
        assert (tvs >= 0).all() and (tvs <= 1).all()
        # GT verbs stay zero
        assert (tvs[np.asarray(labels) > 0] == 0).all()


def test_postprocess_curing_and_cooccurrence():
    from rlipv2_tpu.eval.postprocess import postprocess_hoi

    rng = np.random.RandomState(2)
    B, Q, To, Tv = 1, 4, 5, 3
    outputs = {
        "pred_obj_logits": jnp.asarray(rng.randn(B, Q, To).astype(np.float32)),
        "pred_verb_logits": jnp.asarray(rng.randn(B, Q, Tv).astype(np.float32)),
        "pred_sub_boxes": jnp.asarray(rng.uniform(0.3, 0.6, (B, Q, 4)).astype(np.float32)),
        "pred_obj_boxes": jnp.asarray(rng.uniform(0.3, 0.6, (B, Q, 4)).astype(np.float32)),
        "curing_score": jnp.asarray(np.full((B, Q, 1), 0.5, np.float32)),
    }
    sizes = jnp.asarray([[100.0, 200.0]])
    base = postprocess_hoi(outputs, sizes)
    cured = postprocess_hoi(outputs, sizes, verb_curing=True)
    np.testing.assert_allclose(
        np.asarray(cured["verb_scores"]), 0.5 * np.asarray(base["verb_scores"]),
        rtol=1e-6,
    )
    # co-occurrence prior replaces the flat obj-score multiplier
    co = jnp.asarray(rng.uniform(0.1, 1.0, (To - 1, Tv)).astype(np.float32))
    prior = postprocess_hoi(outputs, sizes, obj_verb_cooccurrence=co)
    obj_prob = np.asarray(jax.nn.softmax(outputs["pred_obj_logits"], -1))[..., :-1]
    exp = np.asarray(jax.nn.sigmoid(outputs["pred_verb_logits"])) * (
        obj_prob @ np.asarray(co)
    )
    np.testing.assert_allclose(np.asarray(prior["verb_scores"]), exp, rtol=1e-5)


def test_model_curing_recon_lang_outputs():
    """Flag-on flagship forward emits curing_score, recon_stat, and
    post-ALIF lang_states; train-relevant grads flow."""
    from test_parseda_forward import tiny_config
    from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params

    base = tiny_config()
    cfg = dataclasses.replace(
        base, verb_curing=True, masked_entity_modeling=True,
        subject_class=True, pseudo_verb=True, pseudo_verb_mode="online",
    )
    model = RLIPParSeDA(cfg)
    B, H, W = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    te = jnp.asarray(rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32))
    tv = jnp.ones((B, T), bool)
    params = init_model_params(
        model, jax.random.PRNGKey(0), pixels, valid, te, tv,
        cfg.max_obj_texts, jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32),
    )
    out = model.apply(params, pixels, valid, te, tv, cfg.max_obj_texts)
    nq2 = cfg.num_queries // 2
    assert out["curing_score"].shape == (B, nq2, 1)
    assert 0.0 <= float(out["curing_score"].min()) <= 1.0
    assert set(out["recon_stat"]) == {
        "pred_sub_logits", "pred_obj_logits", "pred_sub_boxes", "pred_obj_boxes"
    }
    assert out["recon_stat"]["pred_sub_boxes"].shape == (B, nq2, 4)
    assert out["lang_states"].shape == (B, T, cfg.text_encoder.hidden_size)
    for a in out["aux_outputs"]:
        assert "recon_stat" in a and "curing_score" in a
