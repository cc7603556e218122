"""Model-variant forwards: RLIP-ParSeD (non-DAB), RLIP-ParSe (vanilla),
factory dispatch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.models.factory import build_model
from test_parseda_forward import tiny_config


def run_forward(model, cfg, B=1, H=64, W=64):
    T = cfg.max_obj_texts + cfg.max_verb_texts
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    te = jnp.asarray(rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32))
    tv = jnp.ones((B, T), bool)
    params = model.init(
        jax.random.PRNGKey(0), pixels, valid, te, tv, cfg.max_obj_texts
    )
    return model.apply(params, pixels, valid, te, tv, cfg.max_obj_texts)


def check(out, cfg):
    nq2 = cfg.num_queries // 2
    assert out["pred_obj_logits"].shape == (1, nq2, cfg.max_obj_texts)
    assert out["pred_verb_logits"].shape == (1, nq2, cfg.max_verb_texts)
    assert out["pred_sub_boxes"].shape == (1, nq2, 4)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()
    b = np.asarray(out["pred_sub_boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    assert len(out["aux_outputs"]) == cfg.transformer.dec_layers - 1


def test_rlip_parsed_v2():
    cfg = dataclasses.replace(tiny_config(), variant="rlip_parsed_v2")
    out = run_forward(build_model(cfg), cfg)
    check(out, cfg)


def test_rlip_parsed_v1_no_fusion():
    cfg = dataclasses.replace(tiny_config(), variant="rlip_parsed")
    out = run_forward(build_model(cfg), cfg)
    check(out, cfg)


def test_rlip_parse_vanilla():
    cfg = dataclasses.replace(tiny_config(), variant="rlip_parse")
    out = run_forward(build_model(cfg), cfg)
    check(out, cfg)


def test_rlip_parse_v2_alif():
    """v1 + ALIF vanilla encoder (reference:
    models/ParSetransformer.py:1207-1503); completes the five
    BASELINE.json model configs."""
    from rlipv2_tpu.models.parse import RLIPParSeV2

    cfg = dataclasses.replace(tiny_config(), variant="rlip_parse_v2")
    model = build_model(cfg)
    assert isinstance(model, RLIPParSeV2)
    out = run_forward(model, cfg)
    check(out, cfg)
    # post-ALIF language states are exposed for online pseudo-verb
    T = cfg.max_obj_texts + cfg.max_verb_texts
    assert out["lang_states"].shape == (1, T, cfg.text_encoder.hidden_size)


def test_rlip_parse_v2_gradients():
    cfg = dataclasses.replace(tiny_config(), variant="rlip_parse_v2")
    model = build_model(cfg)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    rng = np.random.RandomState(1)
    pixels = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    valid = jnp.ones((1, 64, 64), bool)
    te = jnp.asarray(rng.randn(1, T, cfg.text_encoder.hidden_size).astype(np.float32))
    tv = jnp.ones((1, T), bool)
    params = model.init(
        jax.random.PRNGKey(0), pixels, valid, te, tv, cfg.max_obj_texts
    )

    def loss(p):
        out = model.apply(p, pixels, valid, te, tv, cfg.max_obj_texts)
        return (
            jnp.sum(out["pred_verb_logits"] ** 2)
            + jnp.sum(out["pred_sub_boxes"])
        )

    g = jax.grad(loss)(params)
    norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
    assert np.isfinite(norms).all()
    assert sum(1 for n in norms if n > 0) > len(norms) * 0.5


def test_factory_flagship():
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    cfg = tiny_config()
    assert isinstance(build_model(cfg), RLIPParSeDA)


def test_variants_trainable():
    """Gradients flow for the non-DAB variant through the full loss."""
    from rlipv2_tpu.config import LossConfig
    from rlipv2_tpu.losses import SetCriterionHOI
    from rlipv2_tpu.structures import HOITargets

    cfg = dataclasses.replace(tiny_config(), variant="rlip_parsed_v2")
    model = build_model(cfg)
    B, H, W, M = 1, 64, 64, 4
    T = cfg.max_obj_texts + cfg.max_verb_texts
    rng = np.random.RandomState(1)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    te = jnp.asarray(rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32))
    tv = jnp.ones((B, T), bool)
    params = model.init(jax.random.PRNGKey(0), pixels, valid, te, tv, cfg.max_obj_texts)

    targets = HOITargets(
        obj_labels=jnp.asarray(rng.randint(0, 3, (B, M))),
        sub_labels=jnp.zeros((B, M), jnp.int32),
        verb_labels=jnp.asarray((rng.rand(B, M, cfg.max_verb_texts) > 0.5).astype(np.float32)),
        sub_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        obj_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        valid=jnp.ones((B, M), bool),
    )
    crit = SetCriterionHOI(LossConfig())

    def loss_fn(p):
        out = model.apply(p, pixels, valid, te, tv, cfg.max_obj_texts)
        losses = crit(out, targets, tv[:, : cfg.max_obj_texts], tv[:, cfg.max_obj_texts :])
        return crit.weighted_total(losses)

    g = jax.grad(loss_fn)(params)
    gn = sum(float((np.asarray(x) ** 2).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def run_closed_vocab(model, cfg, B=1, H=64, W=64):
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    params = model.init(jax.random.PRNGKey(0), pixels, valid)
    return model.apply(params, pixels, valid)


def check_closed(out, cfg, nq):
    assert out["pred_obj_logits"].shape == (1, nq, cfg.max_obj_texts)
    assert out["pred_verb_logits"].shape == (1, nq, cfg.max_verb_texts)
    assert out["pred_sub_boxes"].shape == (1, nq, 4)
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()
    assert len(out["aux_outputs"]) == cfg.transformer.dec_layers - 1


def test_qpic_cdn_qahoi_closed_vocab():
    """Closed-vocab baselines QPIC/CDN/QAHOI (reference:
    models/hoi.py:3536, :2587, :2655) forward with finite outputs and the
    repo-wide head contract (no-object = last logit column)."""
    from rlipv2_tpu.models.closed_vocab import CDNModel, QAHOIModel, QPICModel

    cfg = tiny_config()
    nq = cfg.num_queries
    out = run_closed_vocab(QPICModel(cfg), cfg)
    check_closed(out, cfg, nq)
    out = run_closed_vocab(CDNModel(cfg), cfg)
    check_closed(out, cfg, nq)
    out = run_closed_vocab(QAHOIModel(cfg), cfg)
    check_closed(out, cfg, nq)


def test_ocn_sep_variants():
    """OCN (reference models/hoi.py:1048-1240), SepDETRHOI (:1295-1349)
    and SepDDETRHOIv3 (deformable_transformer.py:29-223): forward with
    finite outputs; the Sep variants emit paired (nq//2) predictions."""
    from rlipv2_tpu.models.closed_vocab import (
        OCNModel,
        SepDDETRHOIv3Model,
        SepDETRHOIModel,
    )

    cfg = tiny_config()
    nq = cfg.num_queries
    out = run_closed_vocab(OCNModel(cfg), cfg)
    check_closed(out, cfg, nq)
    for cls in (SepDETRHOIModel, SepDDETRHOIv3Model):
        out = run_closed_vocab(cls(cfg), cfg)
        np2 = nq // 2
        assert out["pred_obj_logits"].shape == (1, np2, cfg.max_obj_texts)
        assert out["pred_verb_logits"].shape == (1, np2, cfg.max_verb_texts)
        assert out["pred_sub_boxes"].shape == (1, np2, 4)
        for v in jax.tree_util.tree_leaves(out):
            assert np.isfinite(np.asarray(v)).all()
        assert len(out["aux_outputs"]) == cfg.transformer.dec_layers - 1


def test_factory_new_closed_vocab():
    for v in ("ocn", "sep_detr_hoi", "sep_ddetr_hoi_v3"):
        cfg = dataclasses.replace(tiny_config(), variant=v)
        m = build_model(cfg)
        assert type(m).__name__ in (
            "OCNModel", "SepDETRHOIModel", "SepDDETRHOIv3Model"
        )


def test_seq_stochastic_variants():
    """SeqDETRHOI (reference models/hoi.py:1242) chained decoders and
    VanillaStochasticDETRHOI (:181-300) latent verb head with KL output."""
    from rlipv2_tpu.models.closed_vocab import (
        SeqDETRHOIModel,
        StochasticDETRHOIModel,
    )

    cfg = tiny_config()
    nq = cfg.num_queries
    out = run_closed_vocab(SeqDETRHOIModel(cfg), cfg)
    check_closed(out, cfg, nq)

    model = StochasticDETRHOIModel(cfg)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    valid = jnp.ones((1, 64, 64), bool)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "stochastic": jax.random.PRNGKey(1)},
        pixels, valid,
    )
    out = model.apply(
        params, pixels, valid, rngs={"stochastic": jax.random.PRNGKey(2)}
    )
    check_closed(out, cfg, nq)
    assert out["verb_kl_divergence"].shape == ()
    assert float(out["verb_kl_divergence"]) >= 0


def test_parse_dab_detr():
    """ParSeDABDETR (reference models/hoi.py:1421 + DAB/transformer.py):
    4-d anchors refined per layer, conditional concat cross-attention,
    vanilla verb decoder; paired outputs, boxes in (0,1)."""
    from rlipv2_tpu.models.dab_detr import ParSeDABDETR

    cfg = tiny_config()
    model = ParSeDABDETR(cfg)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    valid = jnp.ones((1, 64, 64), bool)
    params = model.init(jax.random.PRNGKey(0), pixels, valid)
    out = model.apply(params, pixels, valid)
    np2 = cfg.num_queries // 2
    assert out["pred_obj_logits"].shape == (1, np2, cfg.max_obj_texts)
    assert out["pred_verb_logits"].shape == (1, np2, cfg.max_verb_texts)
    for key in ("pred_sub_boxes", "pred_obj_boxes"):
        b = np.asarray(out[key])
        assert b.shape == (1, np2, 4)
        assert (b >= 0).all() and (b <= 1).all()
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()
    assert len(out["aux_outputs"]) == cfg.transformer.dec_layers - 1


def test_rlip_mdetr_joint_encoder():
    """RLIPMDETR (reference models/mdetr_transformer.py:25-186): joint
    [image; text] encoder with zero text pos, ParSe decoding over the
    joint memory, einsum text heads from post-encoder text states."""
    cfg = dataclasses.replace(tiny_config(), variant="rlip_mdetr")
    model = build_model(cfg)
    assert type(model).__name__ == "RLIPMDETR"
    out = run_forward(model, cfg)
    check(out, cfg)


def test_parse_dab_ddetr():
    """ParSeDABDDETR (reference models/hoi.py:1592-1870): DAB-deformable
    closed-vocab with in-decoder box refinement and the MBF verb path."""
    cfg = dataclasses.replace(tiny_config(), variant="parse_dab_ddetr")
    model = build_model(cfg)
    assert type(model).__name__ == "ParSeDABDDETRModel"
    out = run_closed_vocab(model, cfg)
    np2 = cfg.num_queries // 2
    assert out["pred_obj_logits"].shape == (1, np2, cfg.max_obj_texts)
    assert out["pred_verb_logits"].shape == (1, np2, cfg.max_verb_texts)
    for key in ("pred_sub_boxes", "pred_obj_boxes"):
        b = np.asarray(out[key])
        assert b.shape == (1, np2, 4)
        assert (b >= 0).all() and (b <= 1).all()
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()
    assert len(out["aux_outputs"]) == cfg.transformer.dec_layers - 1


def test_qahoi_two_stage():
    """Two-stage deformable query init (reference
    models/deformable_transformer.py:106-134, 176-191): encoder proposal
    head + top-k seeded decoder; enc_outputs aux present with boxes in
    (0,1) and only valid proposals selected."""
    from rlipv2_tpu.models.closed_vocab import QAHOITwoStageModel

    cfg = dataclasses.replace(
        tiny_config(), two_stage=True, two_stage_num_proposals=8,
        num_queries=8,
    )
    model = QAHOITwoStageModel(cfg)
    out = run_closed_vocab(model, cfg)
    nq = 8
    assert out["pred_obj_logits"].shape == (1, nq, cfg.max_obj_texts)
    for key in ("pred_sub_boxes", "pred_obj_boxes"):
        b = np.asarray(out[key])
        assert (b >= 0).all() and (b <= 1).all()
    enc = out["enc_outputs"]
    assert enc["pred_logits"].shape[:2] == enc["pred_boxes"].shape[:2]
    for v in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(v)).all()


def test_rlip_parse_v1_joint():
    """Faithful v1 joint wiring (reference ParSetransformer.py:963-1207):
    pre-norm joint encoder with per-layer text-state classification, verb
    query pos = h[-1] + o[-1]."""
    cfg = dataclasses.replace(tiny_config(), variant="rlip_parse_v1_joint")
    model = build_model(cfg)
    assert type(model).__name__ == "RLIPParSeV1Joint"
    out = run_forward(model, cfg)
    check(out, cfg)


def test_iterative_and_heatmap_detrhoi():
    """IterativeDETRHOI (vestigial 4-d ref points, reference
    transformer.py:545-609) and DETRHOIhm (heatmap-seeded queries +
    verb_hm output, reference transformer.py:611-678) forward + the
    heatmap focal loss (reference models/hoi.py:4244-4258)."""
    from rlipv2_tpu.losses import SetCriterionHOI
    from rlipv2_tpu.config import LossConfig
    from rlipv2_tpu.models.closed_vocab import (
        DETRHOIhmModel,
        IterativeDETRHOIModel,
    )

    cfg = dataclasses.replace(tiny_config(), variant="iterative_detr_hoi")
    nq = cfg.num_queries
    out = run_closed_vocab(IterativeDETRHOIModel(cfg), cfg)
    check_closed(out, cfg, nq)
    assert out["ref_points"].shape == (1, nq, 4)
    from rlipv2_tpu.models.factory import build_model

    assert isinstance(build_model(cfg), IterativeDETRHOIModel)

    cfg = dataclasses.replace(tiny_config(), variant="detr_hoi_hm")
    model = DETRHOIhmModel(cfg)
    B, H, W = 1, 64, 64
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = np.ones((B, H, W), bool)
    valid[:, 48:, :] = False  # padded bottom quarter
    valid = jnp.asarray(valid)
    params = model.init(jax.random.PRNGKey(0), pixels, valid)
    out = model.apply(params, pixels, valid)
    check_closed(out, cfg, nq)
    hm, pad = out["verb_hm"]
    assert hm.shape[0] == B and hm.shape[1] == 1
    assert np.asarray(hm).min() >= 0 and np.asarray(hm).max() <= 1
    # heatmap focal loss on a synthetic GT with a couple of peaks
    gt = np.zeros((B, 1, 32, 32), np.float32)
    gt[:, :, 5, 7] = 1.0
    gt[:, :, 20, 12] = 0.6
    crit = SetCriterionHOI(LossConfig())
    loss = crit.loss_verb_hm(out, jnp.asarray(gt))["loss_verb_hm"]
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_coupled_detrhoi():
    """CoupledDETRHOI (reference TransformerCoupled,
    transformer.py:683-829): per-layer object-conditioned semantic
    gating feeds the verb head AND the next decoder layer; the semantic
    table attention has NO softmax (reference transformer.py:780-782)."""
    from rlipv2_tpu.models.closed_vocab import CoupledDETRHOIModel
    from rlipv2_tpu.models.factory import build_model

    cfg = dataclasses.replace(tiny_config(), variant="coupled_detr_hoi")
    nq = cfg.num_queries
    model = CoupledDETRHOIModel(cfg)
    assert isinstance(build_model(cfg), CoupledDETRHOIModel)
    out = run_closed_vocab(model, cfg)
    check_closed(out, cfg, nq)
    # the co-occurrence prior must flow into the verb logits: perturbing
    # the whole co table changes verbs (through the semantic gate blend)
    # but NOT the first layer's object logits, which are computed
    # pre-blend (later layers consume the blended stream, so only the
    # first layer is blend-independent)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    valid = jnp.ones((1, 64, 64), bool)
    params = model.init(jax.random.PRNGKey(0), pixels, valid)
    base = model.apply(params, pixels, valid)
    p2 = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    flat = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 3.0 + 0.01
        if any(getattr(k, "key", None) == "obj_verb_co" for k in path)
        else x,
        p2,
    )
    pert = model.apply(flat, pixels, valid)
    dv = float(
        np.abs(
            np.asarray(pert["pred_verb_logits"])
            - np.asarray(base["pred_verb_logits"])
        ).max()
    )
    do = float(
        np.abs(
            np.asarray(pert["aux_outputs"][0]["pred_obj_logits"])
            - np.asarray(base["aux_outputs"][0]["pred_obj_logits"])
        ).max()
    )
    assert dv > 1e-5, "co-occurrence prior does not reach verb logits"
    assert do == 0.0, "prior must not affect layer-0 pre-blend obj logits"
    # buffer semantics: grads must not flow into the frozen prior/table
    # (reference register_buffer, transformer.py:760,765)
    def loss(p):
        o = model.apply(p, pixels, valid)
        return jnp.sum(o["pred_verb_logits"] ** 2)

    g = jax.grad(loss)(params)
    gflat = {
        jax.tree_util.keystr(path): x
        for path, x in jax.tree_util.tree_flatten_with_path(g)[0]
    }
    for key, gx in gflat.items():
        if "obj_verb_co" in key or "verb_word_embedding" in key:
            assert float(np.abs(np.asarray(gx)).max()) == 0.0, key
