"""Detector-checkpoint warm start: a COCO-pretrained DAB-Deformable-DETR
state dict converts into a partial RLIPParSeDA tree (decoder duplicated
into ho/verb, bbox heads into sub/obj clones, tgt_embed into
verb_tgt_embed — reference convert_parameters/convert_parameters_
DABDDETR.py:91-160), merges over an init tree, and one forward runs
(VERDICT round-2 item 10)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from rlipv2_tpu.engine.convert import (
    COCO_OBJ_IDS,
    coco_class_embed_to_hico,
    convert_dab_ddetr_detector,
    merge_param_trees,
)
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params

from test_parseda_forward import tiny_config

rng = np.random.RandomState(0)


def _w(*shape):
    return (rng.randn(*shape) * 0.05).astype(np.float32)


def synth_detector_sd(d=64, nheads=4, enc=2, dec=2, levels=4, points=4,
                      nq_det=32):
    """DAB-Deformable-DETR official key space at tiny dims."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = _w(o, i, k, k)

    def bn(name, c):
        sd[name + ".weight"] = 1 + _w(c)
        sd[name + ".bias"] = _w(c)
        sd[name + ".running_mean"] = _w(c)
        sd[name + ".running_var"] = (0.75 + rng.rand(c) * 0.5).astype(np.float32)

    def lin(name, o, i):
        sd[name + ".weight"] = _w(o, i)
        sd[name + ".bias"] = _w(o)

    # backbone (resnet_test structure: 1 bottleneck per stage)
    pre = "backbone.0.body."
    conv(pre + "conv1", 64, 3, 7)
    bn(pre + "bn1", 64)
    inp = 64
    for s in range(4):
        planes = 64 * 2**s
        p = pre + f"layer{s + 1}.0"
        conv(p + ".conv1", planes, inp, 1)
        bn(p + ".bn1", planes)
        conv(p + ".conv2", planes, planes, 3)
        bn(p + ".bn2", planes)
        conv(p + ".conv3", planes * 4, planes, 1)
        bn(p + ".bn3", planes * 4)
        conv(p + ".downsample.0", planes * 4, inp, 1)
        bn(p + ".downsample.1", planes * 4)
        inp = planes * 4

    for i, c_in in enumerate([512, 1024, 2048, 2048][:levels]):
        conv(f"input_proj.{i}.0", d, c_in, 1 if i < 3 else 3)
        sd[f"input_proj.{i}.0.bias"] = _w(d)
        sd[f"input_proj.{i}.1.weight"] = 1 + _w(d)
        sd[f"input_proj.{i}.1.bias"] = _w(d)

    sd["tgt_embed.weight"] = _w(nq_det, d)
    sd["refpoint_embed.weight"] = _w(nq_det, 4)
    sd["transformer.level_embed"] = _w(levels, d)

    def msda(p):
        lin(p + ".sampling_offsets", nheads * levels * points * 2, d)
        lin(p + ".attention_weights", nheads * levels * points, d)
        lin(p + ".value_proj", d, d)
        lin(p + ".output_proj", d, d)

    for i in range(enc):
        p = f"transformer.encoder.layers.{i}"
        msda(p + ".self_attn")
        sd[p + ".norm1.weight"] = 1 + _w(d)
        sd[p + ".norm1.bias"] = _w(d)
        sd[p + ".norm2.weight"] = 1 + _w(d)
        sd[p + ".norm2.bias"] = _w(d)
        lin(p + ".linear1", 2 * d, d)
        lin(p + ".linear2", d, 2 * d)
    for i in range(dec):
        p = f"transformer.decoder.layers.{i}"
        msda(p + ".cross_attn")
        sd[p + ".self_attn.in_proj_weight"] = _w(3 * d, d)
        sd[p + ".self_attn.in_proj_bias"] = _w(3 * d)
        lin(p + ".self_attn.out_proj", d, d)
        for n in ("norm1", "norm2", "norm3"):
            sd[p + f".{n}.weight"] = 1 + _w(d)
            sd[p + f".{n}.bias"] = _w(d)
        lin(p + ".linear1", 2 * d, d)
        lin(p + ".linear2", d, 2 * d)
        lin(f"transformer.decoder.bbox_embed.{i}.layers.0", d, d)
        lin(f"transformer.decoder.bbox_embed.{i}.layers.1", d, d)
        lin(f"transformer.decoder.bbox_embed.{i}.layers.2", 4, d)
        lin(f"class_embed.{i}", 91, d)
    lin("transformer.decoder.ref_point_head.layers.0", d, 2 * d)
    lin("transformer.decoder.ref_point_head.layers.1", d, d)
    lin("transformer.decoder.query_scale.layers.0", d, d)
    lin("transformer.decoder.query_scale.layers.1", d, d)
    return sd


def test_detector_warm_start_forward():
    cfg = tiny_config()
    sd = synth_detector_sd(
        d=cfg.transformer.hidden_dim, nheads=cfg.transformer.nheads,
        enc=cfg.transformer.enc_layers, dec=cfg.transformer.dec_layers,
    )
    partial = convert_dab_ddetr_detector(sd, cfg)

    # detector queries were 32, model wants num_queries -> filtered
    assert partial["tgt_embed"].shape == (cfg.num_queries,
                                          cfg.transformer.hidden_dim)
    np.testing.assert_array_equal(
        partial["verb_tgt_embed"], partial["tgt_embed"]
    )
    # both decoders carry the duplicated detector decoder + box heads
    # (scanned `layers` layout: stacked on a leading dec_layers axis)
    for decname in ("ho_decoder", "verb_decoder"):
        assert "layer" in partial[decname]["layers"]
        assert "sub_bbox_embed" in partial[decname]["layers"]
        np.testing.assert_array_equal(
            partial[decname]["layers"]["sub_bbox_embed"]["layers_2"]["kernel"],
            partial[decname]["layers"]["obj_bbox_embed"]["layers_2"]["kernel"],
        )

    model = RLIPParSeDA(cfg)
    B, H, W = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    init = init_model_params(
        model, jax.random.PRNGKey(0),
        jnp.zeros((B, H, W, 3)), jnp.ones((B, H, W), bool),
        jnp.zeros((B, T, cfg.text_encoder.hidden_size)),
        jnp.ones((B, T), bool), cfg.max_obj_texts,
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
    )
    merged = merge_param_trees(dict(init["params"]), partial)
    out = model.apply(
        {"params": merged},
        jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        jnp.ones((B, H, W), bool),
        jnp.asarray(rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32)),
        jnp.ones((B, T), bool),
        cfg.max_obj_texts,
    )
    for k in ("pred_obj_logits", "pred_verb_logits", "pred_sub_boxes",
              "pred_obj_boxes"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_coco_class_embed_remap():
    w = _w(91, 16)
    b = _w(91)
    w2, b2 = coco_class_embed_to_hico(w, b)
    assert w2.shape == (81, 16) and b2.shape == (81,)
    # first HICO slot is COCO category 1 = row index 1
    np.testing.assert_array_equal(w2[0], w[COCO_OBJ_IDS[0]])
    # last slot is the fresh background row (id 91 = appended row)
    assert not any(
        np.array_equal(w2[-1], w[i]) for i in range(91)
    )


def test_ddetr_detector_warm_start_forward():
    """Plain Deformable-DETR checkpoint -> RLIPParSeD partial tree
    (reference convert_parameters/convert_parameters_DDETR.py:91-126):
    decoder duplicated into ho/verb, per-layer bbox heads cloned to the
    top-level sub/obj heads, reference_points linear duplicated, 2C query
    embed split-tiled."""
    from rlipv2_tpu.engine.convert import convert_ddetr_detector
    from rlipv2_tpu.models.parsed import RLIPParSeD

    cfg = tiny_config()
    d = cfg.transformer.hidden_dim
    sd = synth_detector_sd(
        d=d, nheads=cfg.transformer.nheads,
        enc=cfg.transformer.enc_layers, dec=cfg.transformer.dec_layers,
    )
    # DDETR key space: 2C query embed + reference_points, no DAB extras
    for k in list(sd):
        if "ref_point_head" in k or "query_scale" in k:
            del sd[k]
    del sd["tgt_embed.weight"], sd["refpoint_embed.weight"]
    sd["query_embed.weight"] = _w(32, 2 * d)
    sd["transformer.reference_points.weight"] = _w(2, d)
    sd["transformer.reference_points.bias"] = _w(2)

    partial = convert_ddetr_detector(sd, cfg)
    assert partial["query_embed"].shape == (cfg.num_queries, 2 * d)
    np.testing.assert_array_equal(
        partial["reference_points_sub"]["kernel"],
        partial["reference_points_obj"]["kernel"],
    )
    np.testing.assert_array_equal(
        partial["sub_bbox_embed_0"]["layers_0"]["kernel"],
        partial["obj_bbox_embed_0"]["layers_0"]["kernel"],
    )
    assert "layer" in partial["ho_decoder_nd"]["layers"]
    assert "layer" in partial["verb_decoder_nd"]["layers"]

    model = RLIPParSeD(cfg)
    B, H, W = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, H, W, 3)), jnp.ones((B, H, W), bool),
        jnp.zeros((B, T, cfg.text_encoder.hidden_size)),
        jnp.ones((B, T), bool), cfg.max_obj_texts,
    )
    merged = merge_param_trees(dict(init["params"]), partial)
    out = model.apply(
        {"params": merged},
        jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        jnp.ones((B, H, W), bool),
        jnp.asarray(rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32)),
        jnp.ones((B, T), bool),
        cfg.max_obj_texts,
    )
    for k in ("pred_obj_logits", "pred_verb_logits", "pred_sub_boxes",
              "pred_obj_boxes"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def synth_detr_sd(d=64, nheads=4, enc=2, dec=2, nq_det=32):
    """Vanilla DETR official key space at tiny dims (dense attention)."""
    sd = {}

    def lin(name, o, i):
        sd[name + ".weight"] = _w(o, i)
        sd[name + ".bias"] = _w(o)

    def mha(p):
        sd[p + ".in_proj_weight"] = _w(3 * d, d)
        sd[p + ".in_proj_bias"] = _w(3 * d)
        lin(p + ".out_proj", d, d)

    def norms(p, names):
        for n in names:
            sd[p + f".{n}.weight"] = 1 + _w(d)
            sd[p + f".{n}.bias"] = _w(d)

    sd["input_proj.weight"] = _w(d, 2048, 1, 1)
    sd["input_proj.bias"] = _w(d)
    sd["query_embed.weight"] = _w(nq_det, d)
    for i in range(enc):
        p = f"transformer.encoder.layers.{i}"
        mha(p + ".self_attn")
        norms(p, ("norm1", "norm2"))
        lin(p + ".linear1", 2 * d, d)
        lin(p + ".linear2", d, 2 * d)
    for i in range(dec):
        p = f"transformer.decoder.layers.{i}"
        mha(p + ".self_attn")
        mha(p + ".multihead_attn")
        norms(p, ("norm1", "norm2", "norm3"))
        lin(p + ".linear1", 2 * d, d)
        lin(p + ".linear2", d, 2 * d)
    sd["transformer.decoder.norm.weight"] = 1 + _w(d)
    sd["transformer.decoder.norm.bias"] = _w(d)
    lin("bbox_embed.layers.0", d, d)
    lin("bbox_embed.layers.1", d, d)
    lin("bbox_embed.layers.2", 4, d)
    lin("class_embed", 92, d)
    return sd


def test_detr_detector_warm_start_forward():
    """Vanilla DETR checkpoint -> RLIPParSeV1Joint partial tree (reference
    convert_parameters/convert_parameters.py:129-141: decoder duplicated
    into ho/verb, bbox head cloned to sub/obj, query embed first-half
    repeated)."""
    import dataclasses as _dc

    from rlipv2_tpu.engine.convert import convert_detr_detector
    from rlipv2_tpu.models.mdetr import RLIPParSeV1Joint

    cfg = tiny_config()
    d = cfg.transformer.hidden_dim
    sd = synth_detr_sd(
        d=d, nheads=cfg.transformer.nheads,
        enc=cfg.transformer.enc_layers, dec=cfg.transformer.dec_layers,
    )
    partial = convert_detr_detector(sd, cfg)
    nq = cfg.num_queries
    np.testing.assert_array_equal(
        partial["query_embed"][: nq // 2], partial["query_embed"][nq // 2 :]
    )
    assert "ho_dec_0" in partial and "verb_dec_0" in partial
    np.testing.assert_array_equal(
        partial["ho_dec_0"]["cross_attn"]["query"]["kernel"],
        partial["verb_dec_0"]["cross_attn"]["query"]["kernel"],
    )
    np.testing.assert_array_equal(
        partial["sub_bbox_embed"]["layers_0"]["kernel"],
        partial["obj_bbox_embed"]["layers_0"]["kernel"],
    )

    model = RLIPParSeV1Joint(cfg)
    B, H, W = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((B, H, W, 3)), jnp.ones((B, H, W), bool),
        jnp.zeros((B, T, 768)), jnp.ones((B, T), bool),
    )
    merged = merge_param_trees(dict(init["params"]), partial)
    out = model.apply(
        {"params": merged},
        jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        jnp.ones((B, H, W), bool),
        jnp.asarray(rng.randn(B, T, 768).astype(np.float32)),
        jnp.ones((B, T), bool),
    )
    for k in ("pred_obj_logits", "pred_verb_logits", "pred_sub_boxes",
              "pred_obj_boxes"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_coco_class_embed_vcoco_variant():
    """V-COCO inserts one fresh object row before the background slot
    (reference convert_parameters/convert_DABDETR.py:80-92)."""
    import numpy as np

    from rlipv2_tpu.engine.convert import coco_class_embed_to_hico

    rng = np.random.RandomState(3)
    w91 = rng.randn(91, 16).astype(np.float32)
    b91 = rng.randn(91).astype(np.float32)
    wh, bh = coco_class_embed_to_hico(w91, b91)
    wv, bv = coco_class_embed_to_hico(w91, b91, dataset="vcoco")
    assert wh.shape == (81, 16) and wv.shape == (82, 16)
    # hico rows preserved, background stays last
    np.testing.assert_array_equal(wv[:80], wh[:80])
    np.testing.assert_array_equal(wv[-1], wh[-1])
    np.testing.assert_array_equal(bv[:80], bh[:80])
    assert bv[80] == 0.0  # fresh inserted row bias
