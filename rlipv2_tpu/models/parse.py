"""RLIP-ParSe (v1): vanilla-DETR open-vocabulary HOI model.

Capability parity with `RLIP_ParSe` + `ParSeTransformer`
(reference: models/hoi.py:2259-2515, models/ParSetransformer.py:963-1207):
single-level backbone feature, standard transformer encoder over image
tokens, disentangled ho (sub || obj) + verb decoders, and MDETR-style
decode-time cross-modal fusion: decoder outputs are concatenated with the
resized text features and run through a fusion encoder whose text half
feeds the einsum classification heads (reference obj_fusion/verb_fusion,
dab_deformable/deformable_transformer.py:283-296 for the module shape).

All attention here is dense (no deformable op): DETR post-LN layers with
positional embeddings added to Q/K.

NOTE: this module keeps round-1's decode-time-fusion design as an
alternative; the REFERENCE-FAITHFUL v1 wiring (joint [image ; text]
post-norm encode with per-encoder-layer text-state classification, verb
query pos = h[-1] + o[-1], shared decoder final norms) is
`RLIPParSeV1Joint` in models/mdetr.py (factory variant
`rlip_parse_v1_joint`), output-verified against the torch
ParSeTransformer in tests/test_parse_v1_parity.py — converted v1
checkpoints should target that variant.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlipv2_tpu.config import ModelConfig
from rlipv2_tpu.models.layers import (
    MLP,
    FeatureResizer,
    MultiBranchFusion,
    normalize_pixels,
)
from rlipv2_tpu.models.parseda import BIAS_C, downsample_mask
from rlipv2_tpu.models.resnet import ResNet
from rlipv2_tpu.models.roberta import RobertaModel
from rlipv2_tpu.ops.positional import sine_position_embedding

NEG = -1e9


class EncoderLayer(nn.Module):
    """DETR encoder layer: self-attn(q=k=x+pos, v=x) + FFN. post-LN by
    default; `pre_norm=True` gives torch's normalize_before variant
    (norm applied before each sub-block, residual on the unnormed input —
    reference ParSetransformer.py TransformerEncoderLayer.forward_pre,
    used by the CrossModel fusion encoders)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32
    pre_norm: bool = False

    @nn.compact
    def __call__(self, x, pos, key_valid=None, deterministic=True):
        t = self.cfg.transformer
        mask = None
        if key_valid is not None:
            mask = key_valid[:, None, None, :]
        if self.pre_norm:
            x2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
            sa = nn.MultiHeadDotProductAttention(
                num_heads=t.nheads, dropout_rate=t.dropout, dtype=self.dtype,
                name="self_attn",
            )(x2 + pos, x2 + pos, x2, mask=mask, deterministic=deterministic)
            x = x + nn.Dropout(t.dropout)(sa, deterministic=deterministic)
            x2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            ff = nn.Dense(t.dim_feedforward, dtype=self.dtype, name="linear1")(x2)
            ff = nn.Dense(t.hidden_dim, dtype=self.dtype, name="linear2")(
                nn.Dropout(t.dropout)(nn.relu(ff), deterministic=deterministic)
            )
            return x + nn.Dropout(t.dropout)(ff, deterministic=deterministic)
        sa = nn.MultiHeadDotProductAttention(
            num_heads=t.nheads, dropout_rate=t.dropout, dtype=self.dtype,
            name="self_attn",
        )(x + pos, x + pos, x, mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            x + nn.Dropout(t.dropout)(sa, deterministic=deterministic)
        )
        ff = nn.Dense(t.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        ff = nn.Dense(t.hidden_dim, dtype=self.dtype, name="linear2")(
            nn.Dropout(t.dropout)(nn.relu(ff), deterministic=deterministic)
        )
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            x + nn.Dropout(t.dropout)(ff, deterministic=deterministic)
        )


class DecoderLayer(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, memory, pos, mem_valid=None, deterministic=True):
        t = self.cfg.transformer
        sa = nn.MultiHeadDotProductAttention(
            num_heads=t.nheads, dropout_rate=t.dropout, dtype=self.dtype,
            name="self_attn",
        )(tgt + query_pos, tgt + query_pos, tgt, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            tgt + nn.Dropout(t.dropout)(sa, deterministic=deterministic)
        )
        mask = None
        if mem_valid is not None:
            mask = mem_valid[:, None, None, :]
        ca = nn.MultiHeadDotProductAttention(
            num_heads=t.nheads, dropout_rate=t.dropout, dtype=self.dtype,
            name="cross_attn",
        )(tgt + query_pos, memory + pos, memory, mask=mask, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
            tgt + nn.Dropout(t.dropout)(ca, deterministic=deterministic)
        )
        ff = nn.Dense(t.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.Dense(t.hidden_dim, dtype=self.dtype, name="linear2")(
            nn.Dropout(t.dropout)(nn.relu(ff), deterministic=deterministic)
        )
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(
            tgt + nn.Dropout(t.dropout)(ff, deterministic=deterministic)
        )


class FusionEncoder(nn.Module):
    """MDETR-style cross-modal fusion: encoder layers over the
    concatenated [queries || text] sequence; returns both halves."""

    cfg: ModelConfig
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, text, text_valid, deterministic=True):
        nq = queries.shape[1]
        x = jnp.concatenate([queries, text], axis=1)
        valid = jnp.concatenate(
            [jnp.ones(queries.shape[:2], bool), text_valid], axis=1
        )
        pos = jnp.zeros_like(x)
        for i in range(self.num_layers):
            x = EncoderLayer(self.cfg, self.dtype, name=f"layer_{i}")(
                x, pos, valid, deterministic
            )
        return x[:, :nq], x[:, nq:]


class VanillaALIFEncoder(nn.Module):
    """ALIF over a vanilla (dense-attention) encoder: every
    `fusion_interval` layers insert a VLFuse block and ONE RobertaLayer on
    the language path, then run the standard DETR encoder layer
    (reference: models/ParSetransformer.py:1535-1610
    `RLIPv2_CrossModelTransformerEncoder`; fusion_last_vis is trivially
    true — there is only one feature level)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, valid, lang_hidden, lang_valid,
                 deterministic=True):
        from rlipv2_tpu.models.fusion import BiAttentionBlock
        from rlipv2_tpu.models.roberta import RobertaLayer, alif_additive_bool_mask

        c = self.cfg
        t = c.transformer
        f = t.fusion
        out = src
        lang = lang_hidden
        lang_states = []
        fusion_idx = 0
        for idx in range(t.enc_layers):
            if idx % f.fusion_interval == 0:
                out, lang = BiAttentionBlock(
                    cfg=f,
                    v_dim=t.hidden_dim,
                    l_dim=c.text_encoder.hidden_size,
                    num_feature_levels=1,
                    dtype=self.dtype,
                    int8_dense=t.int8_dense,
                    name=f"vl_fuse_{fusion_idx}",
                )(out, lang, pos, lang_valid, valid, deterministic)
                lang = RobertaLayer(
                    c.text_encoder, self.dtype, name=f"lang_layer_{fusion_idx}"
                )(
                    lang,
                    alif_additive_bool_mask(lang_valid, self.dtype),
                    deterministic,
                )
                lang_states.append(lang)
                fusion_idx += 1
            out = EncoderLayer(c, self.dtype, name=f"layer_{idx}")(
                out, pos, valid, deterministic
            )
        if f.lang_aux_loss:
            if f.fusion_interval == 1:
                multi_lang = jnp.stack(lang_states[::2], axis=0)
            else:
                multi_lang = jnp.stack(lang_states, axis=0)
        else:
            multi_lang = lang_states[-1]
        return out, multi_lang


class RLIPParSe(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        t = c.transformer
        self.compute_dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        dt = self.compute_dtype

        if c.backbone.name.startswith("resnet"):
            self.backbone = ResNet(
                name_variant=c.backbone.name, num_outputs=1, dtype=dt
            )
        else:
            from rlipv2_tpu.models.swin import SwinTransformer

            self.backbone = SwinTransformer.from_name(
                c.backbone.name, drop_path_rate=c.backbone.drop_path_rate,
                dtype=dt, int8_dense=c.backbone.int8_dense,
            )
        self.text_encoder = RobertaModel(c.text_encoder, dtype=dt)
        self.input_proj = nn.Dense(t.hidden_dim, dtype=dt, name="input_proj")
        self.resizer = FeatureResizer(t.hidden_dim, dropout=0.1, dtype=dt)

        self.enc_layers = [
            EncoderLayer(c, dt, name=f"enc_{i}") for i in range(t.enc_layers)
        ]
        self.ho_layers = [
            DecoderLayer(c, dt, name=f"ho_dec_{i}") for i in range(t.dec_layers)
        ]
        self.verb_layers = [
            DecoderLayer(c, dt, name=f"verb_dec_{i}") for i in range(t.dec_layers)
        ]
        self.obj_fusion = FusionEncoder(c, 2, dt, name="obj_fusion")
        self.verb_fusion = FusionEncoder(c, 2, dt, name="verb_fusion")
        self.verb_tgt_generator = MultiBranchFusion(t.hidden_dim, 16, dtype=dt)

        emb = nn.initializers.normal(1.0)
        self.query_embed = self.param(
            "query_embed", emb, (c.num_queries, t.hidden_dim), jnp.float32
        )
        self.verb_query_embed = self.param(
            "verb_query_embed", emb, (c.num_queries // 2, t.hidden_dim), jnp.float32
        )
        self.sub_bbox_embed = MLP(t.hidden_dim, 4, 3, dtype=dt, name="sub_bbox_embed")
        self.obj_bbox_embed = MLP(t.hidden_dim, 4, 3, dtype=dt, name="obj_bbox_embed")
        self.projection_text = nn.Dense(t.hidden_dim, dtype=dt, name="projection_text")
        self.bias_obj_a = self.param(
            "bias_obj_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )
        self.bias_pred_a = self.param(
            "bias_pred_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )

    def encode_text(self, input_ids, attention_mask, deterministic: bool = True):
        _, pooled = self.text_encoder(input_ids, attention_mask, deterministic)
        return pooled

    def __call__(
        self,
        pixels: jnp.ndarray,
        pixel_valid: jnp.ndarray,
        text_emb: jnp.ndarray,
        text_valid: jnp.ndarray,
        n_obj_texts: Optional[int] = None,
        deterministic: bool = True,
    ):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        n_obj = c.max_obj_texts if n_obj_texts is None else n_obj_texts
        nq = c.num_queries
        np_ = nq // 2

        feat = self.backbone(normalize_pixels(pixels, dt))[-1]  # (B, h, w, C_bb)
        h, w = feat.shape[1], feat.shape[2]
        mask = downsample_mask(pixel_valid, h, w)
        pos = sine_position_embedding(mask, num_pos_feats=t.hidden_dim // 2).astype(dt)

        src = self.input_proj(feat).reshape(B, h * w, t.hidden_dim)
        pos = pos.reshape(B, h * w, t.hidden_dim)
        valid = mask.reshape(B, h * w)

        x = src
        for layer in self.enc_layers:
            x = layer(x, pos, valid, deterministic)
        memory = x

        text_resized = self.resizer(text_emb.astype(dt), deterministic)

        query_pos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None], (B, nq, t.hidden_dim)
        )
        tgt = jnp.zeros_like(query_pos)
        hs = []
        for layer in self.ho_layers:
            tgt = layer(tgt, query_pos, memory, pos, valid, deterministic)
            hs.append(tgt)
        hs_ho = jnp.stack(hs)  # (layers, B, nq, C)

        verb_qpos = jnp.broadcast_to(
            self.verb_query_embed.astype(dt)[None], (B, np_, t.hidden_dim)
        )
        vt = self.verb_tgt_generator(hs_ho[-1][:, :np_], hs_ho[-1][:, np_:])
        hs_v = []
        for layer in self.verb_layers:
            vt = layer(vt, verb_qpos, memory, pos, valid, deterministic)
            hs_v.append(vt)
        hs_verb = jnp.stack(hs_v)

        obj_text = text_resized[:, :n_obj]
        verb_text = text_resized[:, n_obj:]
        obj_text_valid = text_valid[:, :n_obj]
        verb_text_valid = text_valid[:, n_obj:]

        def classify(lvl):
            hs_h, hs_o = hs_ho[lvl][:, :np_], hs_ho[lvl][:, np_:]
            fused_o, obj_text_dec = self.obj_fusion(
                hs_o, obj_text, obj_text_valid, deterministic
            )
            fused_v, verb_text_dec = self.verb_fusion(
                hs_verb[lvl], verb_text, verb_text_valid, deterministic
            )

            def norm_proj(tm):
                tm = tm / jnp.maximum(
                    jnp.linalg.norm(
                        tm.astype(jnp.float32), axis=-1, keepdims=True
                    ),
                    1e-12,
                ).astype(tm.dtype)
                return self.projection_text(tm / 2.0)

            ol = jnp.einsum(
                "bcd,bed->bce", fused_o + self.bias_obj_a.astype(dt),
                norm_proj(obj_text_dec), preferred_element_type=jnp.float32,
            ) + BIAS_C
            vl = jnp.einsum(
                "bcd,bed->bce", fused_v + self.bias_pred_a.astype(dt),
                norm_proj(verb_text_dec), preferred_element_type=jnp.float32,
            ) + BIAS_C
            sb = jax.nn.sigmoid(self.sub_bbox_embed(hs_h))
            ob = jax.nn.sigmoid(self.obj_bbox_embed(hs_o))
            return ol, vl, sb.astype(jnp.float32), ob.astype(jnp.float32)

        outs = [classify(l) for l in range(t.dec_layers)]
        out = {
            "pred_obj_logits": outs[-1][0].astype(jnp.float32),
            "pred_verb_logits": outs[-1][1].astype(jnp.float32),
            "pred_sub_boxes": outs[-1][2],
            "pred_obj_boxes": outs[-1][3],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": o[0].astype(jnp.float32),
                    "pred_verb_logits": o[1].astype(jnp.float32),
                    "pred_sub_boxes": o[2],
                    "pred_obj_boxes": o[3],
                }
                for o in outs[:-1]
            ]
        return out


class RLIPParSeV2(nn.Module):
    """RLIP-ParSe v2: the vanilla-DETR ParSe architecture with the ALIF
    interleaved encoder instead of decode-time MDETR fusion.

    Capability parity with `RLIP_ParSeTransformer_v2` + `RLIP_ParSe`
    (reference: models/ParSetransformer.py:1207-1503 with
    fusion_type=GLIP_attn, models/hoi.py:2259-2515): single-level
    backbone, VanillaALIFEncoder, plain ho/verb decoders (the decoder's
    text cross-attention is disabled in the reference,
    ParSetransformer.py:1759-1760 commented out), verb query pos = sum of
    the last-layer subject and object states (:1487-1489), and einsum
    classification against the per-fusion-layer post-ALIF language states
    resized to hidden_dim (:1495-1498 + hoi.py:2366-2450)."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        t = c.transformer
        self.compute_dtype = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        dt = self.compute_dtype

        if c.backbone.name.startswith("resnet"):
            self.backbone = ResNet(
                name_variant=c.backbone.name, num_outputs=1, dtype=dt
            )
        else:
            from rlipv2_tpu.models.swin import SwinTransformer

            self.backbone = SwinTransformer.from_name(
                c.backbone.name, drop_path_rate=c.backbone.drop_path_rate,
                dtype=dt, int8_dense=c.backbone.int8_dense,
            )
        self.text_encoder = RobertaModel(c.text_encoder, dtype=dt)
        self.input_proj = nn.Dense(t.hidden_dim, dtype=dt, name="input_proj")
        self.resizer = FeatureResizer(t.hidden_dim, dropout=0.1, dtype=dt)
        self.encoder = VanillaALIFEncoder(c, dt, name="encoder")
        self.ho_layers = [
            DecoderLayer(c, dt, name=f"ho_dec_{i}") for i in range(t.dec_layers)
        ]
        self.verb_layers = [
            DecoderLayer(c, dt, name=f"verb_dec_{i}") for i in range(t.dec_layers)
        ]
        emb = nn.initializers.normal(1.0)
        self.query_embed = self.param(
            "query_embed", emb, (c.num_queries, t.hidden_dim), jnp.float32
        )
        self.sub_bbox_embed = MLP(t.hidden_dim, 4, 3, dtype=dt, name="sub_bbox_embed")
        self.obj_bbox_embed = MLP(t.hidden_dim, 4, 3, dtype=dt, name="obj_bbox_embed")
        self.projection_text = nn.Dense(t.hidden_dim, dtype=dt, name="projection_text")
        self.bias_obj_a = self.param(
            "bias_obj_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )
        self.bias_pred_a = self.param(
            "bias_pred_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )

    def encode_text(self, input_ids, attention_mask, deterministic: bool = True):
        _, pooled = self.text_encoder(input_ids, attention_mask, deterministic)
        return pooled

    def __call__(
        self,
        pixels: jnp.ndarray,
        pixel_valid: jnp.ndarray,
        text_emb: jnp.ndarray,
        text_valid: jnp.ndarray,
        n_obj_texts: Optional[int] = None,
        deterministic: bool = True,
    ):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        n_obj = c.max_obj_texts if n_obj_texts is None else n_obj_texts
        nq = c.num_queries
        np_ = nq // 2

        feat = self.backbone(normalize_pixels(pixels, dt))[-1]
        h, w = feat.shape[1], feat.shape[2]
        mask = downsample_mask(pixel_valid, h, w)
        pos = sine_position_embedding(mask, num_pos_feats=t.hidden_dim // 2).astype(dt)
        src = self.input_proj(feat).reshape(B, h * w, t.hidden_dim)
        pos = pos.reshape(B, h * w, t.hidden_dim)
        valid = mask.reshape(B, h * w)

        memory, multi_lang = self.encoder(
            src, pos, valid, text_emb.astype(dt), text_valid, deterministic
        )

        text_resized = self.resizer(multi_lang, deterministic)
        if text_resized.ndim == 3:
            text_dec = jnp.broadcast_to(
                text_resized[None], (t.dec_layers, *text_resized.shape)
            )
        else:
            text_dec = text_resized
            F = text_dec.shape[0]
            if F < t.dec_layers:
                pad = jnp.broadcast_to(
                    text_dec[-1:], (t.dec_layers - F, *text_dec.shape[1:])
                )
                text_dec = jnp.concatenate([text_dec, pad], axis=0)
            elif F > t.dec_layers:
                text_dec = text_dec[-t.dec_layers :]

        query_pos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None], (B, nq, t.hidden_dim)
        )
        tgt = jnp.zeros_like(query_pos)
        hs = []
        for layer in self.ho_layers:
            tgt = layer(tgt, query_pos, memory, pos, valid, deterministic)
            hs.append(tgt)
        hs_ho = jnp.stack(hs)

        # verb queries: sum of last-layer sub/obj states as query pos with
        # zero targets (reference: ParSetransformer.py:1487-1489)
        verb_qpos = hs_ho[-1][:, :np_] + hs_ho[-1][:, np_:]
        vt = jnp.zeros_like(verb_qpos)
        hs_v = []
        for layer in self.verb_layers:
            vt = layer(vt, verb_qpos, memory, pos, valid, deterministic)
            hs_v.append(vt)
        hs_verb = jnp.stack(hs_v)

        def classify(lvl):
            hs_h, hs_o = hs_ho[lvl][:, :np_], hs_ho[lvl][:, np_:]
            tm = text_dec[lvl]
            tm = tm / jnp.maximum(
                jnp.linalg.norm(tm.astype(jnp.float32), axis=-1, keepdims=True),
                1e-12,
            ).astype(tm.dtype)
            proj = self.projection_text(tm / 2.0)
            obj_text = proj[:, :n_obj]
            pred_text = proj[:, n_obj:]
            ol = jnp.einsum(
                "bcd,bed->bce", hs_o + self.bias_obj_a.astype(dt), obj_text,
                preferred_element_type=jnp.float32,
            ) + BIAS_C
            vl = jnp.einsum(
                "bcd,bed->bce", hs_verb[lvl] + self.bias_pred_a.astype(dt),
                pred_text, preferred_element_type=jnp.float32,
            ) + BIAS_C
            sb = jax.nn.sigmoid(self.sub_bbox_embed(hs_h))
            ob = jax.nn.sigmoid(self.obj_bbox_embed(hs_o))
            return ol, vl, sb.astype(jnp.float32), ob.astype(jnp.float32)

        outs = [classify(l) for l in range(t.dec_layers)]
        out = {
            "pred_obj_logits": outs[-1][0].astype(jnp.float32),
            "pred_verb_logits": outs[-1][1].astype(jnp.float32),
            "pred_sub_boxes": outs[-1][2],
            "pred_obj_boxes": outs[-1][3],
            # last verb-decoder layer's hidden states for the uniformity
            # analysis eval (reference: models/hoi.py:2173)
            "verb_decoder_out": hs_verb[-1].astype(jnp.float32),
            "lang_states": (
                multi_lang if multi_lang.ndim == 3 else multi_lang[-1]
            ).astype(jnp.float32),
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": o[0].astype(jnp.float32),
                    "pred_verb_logits": o[1].astype(jnp.float32),
                    "pred_sub_boxes": o[2],
                    "pred_obj_boxes": o[3],
                }
                for o in outs[:-1]
            ]
        return out
