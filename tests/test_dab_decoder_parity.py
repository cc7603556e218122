"""DAB ParSe deformable decoder parity vs the torch reference
(DABDeformableTransformerDecoderHOI + DeformableTransformerDecoderLayer,
reference models/dab_deformable/deformable_transformer.py:1346-1553) at
canonical dims: random torch weights converted into our DABHOIDecoder;
per-layer hidden states and refined (sub, obj) anchors must match.
Covers the parse (disentangled) DAB path with box refinement and the
verb path (midpoint references, no refinement)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import ref_import  # noqa: E402

from rlipv2_tpu.config import TransformerConfig
from rlipv2_tpu.engine.convert import (
    _layernorm,
    _linear,
    _mha,
    _mlp,
    _msda,
    group_dab_decoder_layers,
)
from rlipv2_tpu.models.dab_decoder import DABHOIDecoder

SHAPES = ((6, 8), (3, 4), (2, 2), (1, 1))
D = 256
NL = 3  # decoder layers


def build_reference(parse=True, use_dab=True, refine=True):
    dd = ref_import.load("models.dab_deformable.deformable_transformer")
    layer = dd.DeformableTransformerDecoderLayer(
        d_model=D, d_ffn=1024, dropout=0.0, activation="relu",
        n_levels=4, n_heads=8, n_points=4,
    )
    dec = dd.DABDeformableTransformerDecoderHOI(
        layer, NL, return_intermediate=True, use_dab=use_dab, d_model=D,
        ParSe=parse,
    )
    if refine:
        mlp = dd.MLP(D, D, 4, 3)
        dec.sub_bbox_embed = dd._get_clones(mlp, NL)
        dec.obj_bbox_embed = dd._get_clones(mlp, NL)
    dec.eval()
    return dec


def convert_decoder(sd, refine=True):
    params = {}
    for i in range(NL):
        p = f"layers.{i}"
        params[f"layer_{i}"] = {
            "cross_attn": _msda(sd, f"{p}.cross_attn"),
            "self_attn": _mha(sd, f"{p}.self_attn", D, 8),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    params["ref_point_head"] = _mlp(sd, "ref_point_head", 2)
    params["query_scale"] = _mlp(sd, "query_scale", 2)
    if refine:
        for l in range(NL):
            params[f"sub_bbox_embed_{l}"] = _mlp(sd, f"sub_bbox_embed.{l}", 3)
            params[f"obj_bbox_embed_{l}"] = _mlp(sd, f"obj_bbox_embed.{l}", 3)
    return group_dab_decoder_layers(params, NL)


def make_inputs(seed=0, n_pairs=6):
    rng = np.random.RandomState(seed)
    B = 2
    S = sum(h * w for h, w in SHAPES)
    src = rng.randn(B, S, D).astype(np.float32)
    valid = np.ones((B, S), bool)
    valid[0, 40:48] = False
    vr = np.ones((B, 4, 2), np.float32)
    sub_ref = rng.uniform(0.1, 0.9, (n_pairs, 4)).astype(np.float32)
    obj_ref = rng.uniform(0.1, 0.9, (n_pairs, 4)).astype(np.float32)
    tgt = rng.randn(B, 2 * n_pairs, D).astype(np.float32)
    return src, valid, vr, sub_ref, obj_ref, tgt


def test_dab_parse_decoder_matches_reference():
    torch.manual_seed(0)
    dec_t = build_reference(parse=True)
    src, valid, vr, sub_ref, obj_ref, tgt = make_inputs()
    B = src.shape[0]
    np_ = sub_ref.shape[0]

    shapes_t = torch.tensor(SHAPES, dtype=torch.long)
    lsi = torch.tensor(
        np.cumsum([0] + [h * w for h, w in SHAPES])[:-1], dtype=torch.long
    )
    with torch.no_grad():
        hs_t, refs_t = dec_t(
            torch.tensor(tgt),
            (torch.tensor(sub_ref), torch.tensor(obj_ref)),
            torch.tensor(src),
            shapes_t,
            lsi,
            torch.tensor(vr),
            query_pos=None,
            src_padding_mask=torch.tensor(~valid),
        )

    sd = {k: v.detach().numpy() for k, v in dec_t.state_dict().items()}
    params = convert_decoder(sd)
    tcfg = TransformerConfig(
        hidden_dim=D, nheads=8, dec_layers=NL, dim_feedforward=1024,
        dropout=0.0, num_feature_levels=4, dec_n_points=4,
    )
    ours = DABHOIDecoder(
        tcfg, parse=True, use_dab=True, do_self_attn=True,
        refine_boxes=True, dtype=jnp.float32,
    )
    out = ours.apply(
        {"params": params},
        jnp.asarray(tgt),
        jnp.broadcast_to(jnp.asarray(sub_ref)[None], (B, np_, 4)),
        jnp.broadcast_to(jnp.asarray(obj_ref)[None], (B, np_, 4)),
        jnp.asarray(src),
        SHAPES,
        jnp.asarray(vr),
        jnp.asarray(valid),
        True,
    )
    np.testing.assert_allclose(
        np.asarray(out["hs"]), hs_t.numpy(), atol=2e-4, err_msg="hidden"
    )
    # refs_t: (layers, 2, B, np, 4) after the stack/transpose;
    # compare the per-layer refined anchors
    np.testing.assert_allclose(
        np.asarray(out["sub_boxes"]), refs_t[:, 0], atol=2e-4,
        err_msg="sub boxes",
    )
    np.testing.assert_allclose(
        np.asarray(out["obj_boxes"]), refs_t[:, 1], atol=2e-4,
        err_msg="obj boxes",
    )


def test_dab_verb_decoder_matches_reference():
    """Verb path: ParSe=False (midpoint (sub+obj)/2 references), DAB query
    pos, no box refinement."""
    torch.manual_seed(1)
    dec_t = build_reference(parse=False, refine=False)
    src, valid, vr, sub_ref, obj_ref, tgt = make_inputs(seed=1)
    B = src.shape[0]
    np_ = sub_ref.shape[0]
    vt = tgt[:, :np_]

    shapes_t = torch.tensor(SHAPES, dtype=torch.long)
    lsi = torch.tensor(
        np.cumsum([0] + [h * w for h, w in SHAPES])[:-1], dtype=torch.long
    )
    sub_b = torch.tensor(sub_ref)[None].repeat(B, 1, 1)
    obj_b = torch.tensor(obj_ref)[None].repeat(B, 1, 1)
    with torch.no_grad():
        hs_t, _ = dec_t(
            torch.tensor(vt),
            (sub_b, obj_b),
            torch.tensor(src),
            shapes_t,
            lsi,
            torch.tensor(vr),
            query_pos=None,
            src_padding_mask=torch.tensor(~valid),
        )

    sd = {k: v.detach().numpy() for k, v in dec_t.state_dict().items()}
    params = convert_decoder(sd, refine=False)
    tcfg = TransformerConfig(
        hidden_dim=D, nheads=8, dec_layers=NL, dim_feedforward=1024,
        dropout=0.0, num_feature_levels=4, dec_n_points=4,
    )
    ours = DABHOIDecoder(
        tcfg, parse=False, use_dab=True, do_self_attn=True,
        refine_boxes=False, dtype=jnp.float32,
    )
    out = ours.apply(
        {"params": params},
        jnp.asarray(vt),
        jnp.broadcast_to(jnp.asarray(sub_ref)[None], (B, np_, 4)),
        jnp.broadcast_to(jnp.asarray(obj_ref)[None], (B, np_, 4)),
        jnp.asarray(src),
        SHAPES,
        jnp.asarray(vr),
        jnp.asarray(valid),
        True,
    )
    np.testing.assert_allclose(
        np.asarray(out["hs"]), hs_t.numpy(), atol=2e-4, err_msg="verb hidden"
    )
