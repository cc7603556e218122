"""RLIP-ParSe v1 transformer parity vs the torch reference
(ParSeTransformer, models/ParSetransformer.py:963-1207, the canonical
post-norm configuration): joint [image ; text] encode with per-layer
intermediates, ho/verb decode with shared final norms, verb query pos =
h[-1] + o[-1]. Random torch weights are converted into RLIPParSeV1Joint
(features bypass, states exposed) and the decoder hidden states plus the
per-encoder-layer text states must match."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp  # noqa: E402

import ref_import  # noqa: E402

from rlipv2_tpu.config import ModelConfig, TextEncoderConfig, TransformerConfig
from rlipv2_tpu.engine.convert import _layernorm, _linear, _mha
from rlipv2_tpu.models.mdetr import RLIPParSeV1Joint

D = 256
ENC, DEC = 4, 3


def _build_reference():
    import transformers

    pt = ref_import.load("models.ParSetransformer")
    orig_rm = transformers.RobertaModel.from_pretrained
    orig_tk = transformers.RobertaTokenizerFast.from_pretrained
    try:
        transformers.RobertaModel.from_pretrained = classmethod(
            lambda cls, *a, **k: transformers.RobertaModel(
                transformers.RobertaConfig(layer_norm_eps=1e-5)
            )
        )
        transformers.RobertaTokenizerFast.from_pretrained = classmethod(
            lambda cls, *a, **k: None
        )
        torch.manual_seed(0)
        model = pt.ParSeTransformer(
            d_model=D, nhead=8, num_encoder_layers=ENC,
            num_decoder_layers=DEC, dim_feedforward=1024, dropout=0.0,
            return_intermediate_dec=True,
        )
    finally:
        transformers.RobertaModel.from_pretrained = orig_rm
        transformers.RobertaTokenizerFast.from_pretrained = orig_tk
    model.eval()
    return model


def _convert(sd):
    params = {}
    for i in range(ENC):
        p = f"encoder.layers.{i}"
        params[f"enc_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn", D, 8),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    for name in ("ho", "verb"):
        for i in range(DEC):
            p = f"{name}_decoder.layers.{i}"
            # MDETR-style layer: cross_attn_image + norm1/norm3/norm4
            # (the text cross-attn slot norm2 is commented out upstream)
            params[f"{name}_dec_{i}"] = {
                "self_attn": _mha(sd, f"{p}.self_attn", D, 8),
                "cross_attn": _mha(sd, f"{p}.cross_attn_image", D, 8),
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm3"),
                "norm3": _layernorm(sd, f"{p}.norm4"),
                "linear1": _linear(sd, f"{p}.linear1"),
                "linear2": _linear(sd, f"{p}.linear2"),
            }
        params[f"{name}_decoder_norm"] = _layernorm(sd, f"{name}_decoder.norm")
    params["resizer"] = {
        "fc": _linear(sd, "resizer.fc"),
        "layer_norm": _layernorm(sd, "resizer.layer_norm"),
    }
    return params


def test_parse_v1_transformer_matches_reference():
    model_t = _build_reference()
    rng = np.random.RandomState(0)
    B, h, w, T = 2, 6, 8, 6
    n_obj, n_pred = 4, 2
    nq = 8
    S = h * w

    src = rng.randn(B, D, h, w).astype(np.float32)
    pos = rng.randn(B, D, h, w).astype(np.float32)
    valid = np.ones((B, h, w), bool)
    valid[0, 4:, :] = False
    text768 = rng.randn(T, B, 768).astype(np.float32)
    text_valid = np.ones((B, T), bool)
    qe = rng.randn(nq, D).astype(np.float32)
    sums = torch.tensor([[n_obj, n_pred]] * B)

    with torch.no_grad():
        resized_t = model_t.resizer(torch.tensor(text768))  # (T, B, 256)
        cache = model_t(
            src=torch.tensor(src),
            mask=torch.tensor(~valid),
            query_embed=torch.tensor(qe),
            pos_embed=torch.tensor(pos),
            text=(
                torch.tensor(~text_valid).T,  # (T, B) True = pad
                resized_t,
                sums,
            ),
            encode_and_save=True,
        )
        h_t, o_t, v_t = model_t(
            mask=cache["mask"],
            query_embed=cache["ho_query_embed"],
            pos_embed=cache["pos_embed"],
            encode_and_save=False,
            text_memory=cache["text_memory"][-1],
            img_memory=cache["img_memory"],
            text_attention_mask=cache["text_attention_mask"],
        )
        # per-encoder-layer text states (layers, T, B, C) -> (layers, B, T, C)
        text_states_t = cache["text_memory"].transpose(1, 2).numpy()

    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    params = _convert(sd)

    cfg = ModelConfig(
        text_encoder=TextEncoderConfig(),
        transformer=TransformerConfig(
            hidden_dim=D, nheads=8, enc_layers=ENC, dec_layers=DEC,
            dim_feedforward=1024, dropout=0.0,
        ),
        num_queries=nq, max_obj_texts=n_obj, max_verb_texts=n_pred,
        dtype="float32",
    )
    ours = RLIPParSeV1Joint(cfg)
    # init to get the full tree, then overwrite converted subtrees;
    # classification heads are NOT compared (random on both sides differ)
    dummy_px = jnp.zeros((B, 8, 8, 3))
    init = ours.init(
        jax.random.PRNGKey(0), dummy_px, jnp.ones((B, 8, 8), bool),
        jnp.asarray(np.transpose(text768, (1, 0, 2))),
        jnp.asarray(text_valid), n_obj, True,
        (
            jnp.zeros((B, S, D)), jnp.zeros((B, S, D)),
            jnp.ones((B, S), bool),
        ),
    )
    full = dict(init["params"])
    full.update(params)
    # the torch side used query_embed externally
    full["query_embed"] = jnp.asarray(qe)

    src_flat = np.transpose(src.reshape(B, D, S), (0, 2, 1))
    pos_flat = np.transpose(pos.reshape(B, D, S), (0, 2, 1))
    out = ours.apply(
        {"params": full},
        dummy_px,
        jnp.ones((B, 8, 8), bool),
        jnp.asarray(np.transpose(text768, (1, 0, 2))),
        jnp.asarray(text_valid),
        n_obj,
        True,
        (
            jnp.asarray(src_flat), jnp.asarray(pos_flat),
            jnp.asarray(valid.reshape(B, S)),
        ),
        True,
    )
    st = out["states"]
    hs_ho = np.asarray(st["hs_ho"])  # (layers, B, nq, C)
    np_pairs = nq // 2
    np.testing.assert_allclose(
        hs_ho[:, :, :np_pairs], h_t.numpy(), atol=2e-4, err_msg="h states"
    )
    np.testing.assert_allclose(
        hs_ho[:, :, np_pairs:], o_t.numpy(), atol=2e-4, err_msg="o states"
    )
    np.testing.assert_allclose(
        np.asarray(st["hs_verb"]), v_t.numpy(), atol=2e-4,
        err_msg="verb states",
    )
    np.testing.assert_allclose(
        np.asarray(st["text_states"]), text_states_t, atol=2e-4,
        err_msg="text states",
    )
