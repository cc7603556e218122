"""Full RLIP-ParSeDA converter: synthesize a reference-shaped torch
state_dict (names per the reference module tree) and check the converted
tree matches our model params exactly (paths + shapes)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.engine.convert import convert_rlip_parseda
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
from test_parseda_forward import tiny_config

torch = pytest.importorskip("torch")


def synth_reference_sd(cfg):
    """Build the reference checkpoint key space with correctly-shaped
    random tensors (module tree per models/hoi.py:1871-1994 +
    dab_deformable/deformable_transformer.py:234-380)."""
    t = cfg.transformer
    d = t.hidden_dim
    tc = cfg.text_encoder
    L = t.num_feature_levels
    H = t.nheads
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = np.random.randn(dout, din).astype(np.float32)
        sd[f"{name}.bias"] = np.random.randn(dout).astype(np.float32)

    def ln(name, dim):
        sd[f"{name}.weight"] = np.random.randn(dim).astype(np.float32)
        sd[f"{name}.bias"] = np.random.randn(dim).astype(np.float32)

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = np.random.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        for suffix, val in (("weight", np.ones(c)), ("bias", np.zeros(c)),
                            ("running_mean", np.zeros(c)), ("running_var", np.ones(c))):
            sd[f"{name}.{suffix}"] = val.astype(np.float32)

    def mha(name, dim):
        sd[f"{name}.in_proj_weight"] = np.random.randn(3 * dim, dim).astype(np.float32)
        sd[f"{name}.in_proj_bias"] = np.random.randn(3 * dim).astype(np.float32)
        lin(f"{name}.out_proj", dim, dim)

    def msda(name):
        lin(f"{name}.sampling_offsets", d, H * L * t.enc_n_points * 2)
        lin(f"{name}.attention_weights", d, H * L * t.enc_n_points)
        lin(f"{name}.value_proj", d, d)
        lin(f"{name}.output_proj", d, d)

    def roberta_layer(p, hs, inter):
        for qkv in ("query", "key", "value"):
            lin(f"{p}.attention.self.{qkv}", hs, hs)
        lin(f"{p}.attention.output.dense", hs, hs)
        ln(f"{p}.attention.output.LayerNorm", hs)
        lin(f"{p}.intermediate.dense", hs, inter)
        lin(f"{p}.output.dense", inter, hs)
        ln(f"{p}.output.LayerNorm", hs)

    # backbone (resnet_test: 1 block/stage, all with downsample)
    conv("backbone.0.body.conv1", 64, 3, 7)
    bn("backbone.0.body.bn1", 64)
    cin, feats = 64, 64
    for stage in range(4):
        p = f"backbone.0.body.layer{stage + 1}.0"
        conv(f"{p}.conv1", feats, cin, 1)
        bn(f"{p}.bn1", feats)
        conv(f"{p}.conv2", feats, feats, 3)
        bn(f"{p}.bn2", feats)
        conv(f"{p}.conv3", feats * 4, feats, 1)
        bn(f"{p}.bn3", feats * 4)
        conv(f"{p}.downsample.0", feats * 4, cin, 1)
        bn(f"{p}.downsample.1", feats * 4)
        cin, feats = feats * 4, feats * 2

    # input projections
    chans = [512, 1024, 2048, 2048]
    ins = [512, 1024, 2048, 2048]
    for i in range(L):
        o, inn = d, ins[min(i, 2)] if i < 3 else 2048
        k = 1 if i < 3 else 3
        conv(f"input_proj.{i}.0", d, inn, k)
        sd[f"input_proj.{i}.0.bias"] = np.random.randn(d).astype(np.float32)
        ln(f"input_proj.{i}.1", d)

    # queries + cls params
    sd["tgt_embed.weight"] = np.random.randn(cfg.num_queries, d).astype(np.float32)
    sd["verb_tgt_embed.weight"] = np.random.randn(cfg.num_queries, d).astype(np.float32)
    sd["refpoint_embed.weight"] = np.random.randn(cfg.num_queries, 4).astype(np.float32)
    sd["transformer.level_embed"] = np.random.randn(L, d).astype(np.float32)
    lin("projection_text", d, d)
    sd["bias_obj_a"] = np.zeros(d, np.float32)
    sd["bias_pred_a"] = np.zeros(d, np.float32)

    # ALIF encoder
    for i in range(t.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        msda(f"{p}.self_attn")
        ln(f"{p}.norm1", d)
        ln(f"{p}.norm2", d)
        lin(f"{p}.linear1", d, t.dim_feedforward)
        lin(f"{p}.linear2", t.dim_feedforward, d)
    n_fusion = t.enc_layers // t.fusion.fusion_interval
    for f in range(n_fusion):
        roberta_layer(
            f"transformer.encoder.roberta_layers.{f}", tc.hidden_size,
            tc.intermediate_size,
        )
        vp = f"transformer.encoder.VLFuse_layers.{f}.b_attn"
        ln(f"{vp}.layer_norm_v", d)
        ln(f"{vp}.layer_norm_l", tc.hidden_size)
        sd[f"{vp}.gamma_v"] = np.full(d, 0.25, np.float32)
        sd[f"{vp}.gamma_l"] = np.full(tc.hidden_size, 0.25, np.float32)
        e = t.fusion.embed_dim
        lin(f"{vp}.attn.v_proj", d, e)
        lin(f"{vp}.attn.l_proj", tc.hidden_size, e)
        lin(f"{vp}.attn.values_v_proj", d, e)
        lin(f"{vp}.attn.values_l_proj", tc.hidden_size, e)
        lin(f"{vp}.attn.out_v_proj", e, d)
        lin(f"{vp}.attn.out_l_proj", e, tc.hidden_size)

    # decoders + box-head clones
    for torch_name in ("ho_decoder", "verb_decoder"):
        for i in range(t.dec_layers):
            p = f"transformer.{torch_name}.layers.{i}"
            msda(f"{p}.cross_attn")
            mha(f"{p}.self_attn", d)
            for n in ("norm1", "norm2", "norm3"):
                ln(f"{p}.{n}", d)
            lin(f"{p}.linear1", d, t.dim_feedforward)
            lin(f"{p}.linear2", t.dim_feedforward, d)
        for head, dims in (("ref_point_head", [(2 * d, d), (d, d)]),
                           ("query_scale", [(d, d), (d, d)])):
            for j, (din, dout) in enumerate(dims):
                lin(f"transformer.{torch_name}.{head}.layers.{j}", din, dout)
    for clone in range(2 * t.dec_layers):
        for name in ("sub_bbox_embed", "obj_bbox_embed"):
            dims = [(d, d), (d, d), (d, 4)]
            for j, (din, dout) in enumerate(dims):
                lin(f"{name}.{clone}.layers.{j}", din, dout)

    # MBF
    sub_repr = d // 16
    for k in range(16):
        lin(f"transformer.verb_tgt_generator.fc_1.{k}", d, sub_repr)
        lin(f"transformer.verb_tgt_generator.fc_2.{k}", d, sub_repr)
        lin(f"transformer.verb_tgt_generator.fc_3.{k}", sub_repr, d)

    # text encoder + resizer
    tp = "transformer.text_encoder."
    sd[tp + "embeddings.word_embeddings.weight"] = np.random.randn(tc.vocab_size, tc.hidden_size).astype(np.float32)
    sd[tp + "embeddings.position_embeddings.weight"] = np.random.randn(tc.max_position_embeddings, tc.hidden_size).astype(np.float32)
    sd[tp + "embeddings.token_type_embeddings.weight"] = np.random.randn(tc.type_vocab_size, tc.hidden_size).astype(np.float32)
    ln(tp + "embeddings.LayerNorm", tc.hidden_size)
    for i in range(tc.num_layers):
        roberta_layer(tp + f"encoder.layer.{i}", tc.hidden_size, tc.intermediate_size)
    lin(tp + "pooler.dense", tc.hidden_size, tc.hidden_size)
    lin("transformer.resizer.fc", tc.hidden_size, d)
    ln("transformer.resizer.layer_norm", d)
    return sd


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v).shape
    return out


def test_full_converter_tree_matches():
    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    B, Hh, Ww = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    ref_params = init_model_params(
        model, jax.random.PRNGKey(0), jnp.zeros((B, Hh, Ww, 3)),
        jnp.ones((B, Hh, Ww), bool),
        jnp.zeros((B, T, cfg.text_encoder.hidden_size)), jnp.ones((B, T), bool),
        cfg.max_obj_texts, jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32),
    )["params"]

    np.random.seed(0)
    sd = synth_reference_sd(cfg)
    converted = convert_rlip_parseda(sd, cfg)

    want = flatten(ref_params)
    got = flatten(converted)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converter missing {len(missing)}: {missing[:8]}"
    assert not extra, f"converter extra {len(extra)}: {extra[:8]}"
    mismatched = [k for k in want if want[k] != got[k]]
    assert not mismatched, [(k, want[k], got[k]) for k in mismatched[:8]]

    # converted params actually run
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 64, 64), bool),
        jnp.zeros((1, T, cfg.text_encoder.hidden_size)), jnp.ones((1, T), bool),
        cfg.max_obj_texts,
    )
    assert np.isfinite(np.asarray(out["pred_verb_logits"])).all()
