"""MDETR-style joint image-text transformer variant.

Capability parity with the reference's MDETR-derived transformer
(models/mdetr_transformer.py:25-186 — image tokens and resized text
tokens CONCATENATED on the sequence axis through one shared encoder, text
positional embedding = zeros so `+pos` is a no-op for text; the decoder
cross-attends the JOINT memory, :358-404) used for the MDETR-init
RLIP-ParSe experiments. The classification stays the repo-wide ParSe
einsum bias-trick head, reading the POST-ENCODER text states (MDETR's
`memory_cache["text_memory"]` consumed at decode time).

TPU-first notes: the joint sequence is a single static concat (text slot
count is a compile-time constant), so the encoder runs one fused
attention over (S_img + T) tokens — no ragged text lengths; invalid text
slots are masked via the joint key-valid mask.
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
from rlipv2_tpu.models.parse import BIAS_C, DecoderLayer, EncoderLayer
from rlipv2_tpu.models.parseda import downsample_mask
from rlipv2_tpu.models.resnet import ResNet
from rlipv2_tpu.ops.positional import sine_position_embedding


class RLIPMDETR(nn.Module):
    """ParSe decoding over an MDETR joint image-text encoder."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        t = c.transformer
        self.compute_dtype = (
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        dt = self.compute_dtype
        self.backbone = ResNet(
            name_variant=c.backbone.name, num_outputs=1, dtype=dt
        )
        self.input_proj = nn.Dense(t.hidden_dim, dtype=dt, name="input_proj")
        self.resizer = FeatureResizer(
            t.hidden_dim, dropout=t.dropout, dtype=dt, name="resizer"
        )
        self.enc_layers = [
            EncoderLayer(c, dt, name=f"enc_{i}") for i in range(t.enc_layers)
        ]
        self.ho_layers = [
            DecoderLayer(c, dt, name=f"ho_dec_{i}")
            for i in range(t.dec_layers)
        ]
        self.verb_layers = [
            DecoderLayer(c, dt, name=f"verb_dec_{i}")
            for i in range(t.dec_layers)
        ]
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (c.num_queries, t.hidden_dim), jnp.float32,
        )
        self.verb_query_embed = self.param(
            "verb_query_embed", nn.initializers.normal(1.0),
            (c.num_queries // 2, t.hidden_dim), jnp.float32,
        )
        self.verb_tgt_generator = MultiBranchFusion(t.hidden_dim, 16, dtype=dt)
        self.sub_bbox_embed = MLP(
            t.hidden_dim, 4, 3, dtype=dt, name="sub_bbox_embed"
        )
        self.obj_bbox_embed = MLP(
            t.hidden_dim, 4, 3, dtype=dt, name="obj_bbox_embed"
        )
        self.projection_text = nn.Dense(
            t.hidden_dim, dtype=dt, name="projection_text"
        )
        self.bias_obj_a = self.param(
            "bias_obj_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )
        self.bias_pred_a = self.param(
            "bias_pred_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )

    def __call__(
        self,
        pixels: jnp.ndarray,
        pixel_valid: jnp.ndarray,
        text_emb: jnp.ndarray,  # (B, T, 768) pooled label features
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
        T = text_emb.shape[1]

        feat = self.backbone(normalize_pixels(pixels, dt))[-1]
        h, w = feat.shape[1], feat.shape[2]
        mask = downsample_mask(pixel_valid, h, w)
        pos = sine_position_embedding(
            mask, num_pos_feats=t.hidden_dim // 2
        ).astype(dt)
        src = self.input_proj(feat).reshape(B, h * w, t.hidden_dim)
        pos = pos.reshape(B, h * w, t.hidden_dim)
        valid = mask.reshape(B, h * w)

        text_resized = self.resizer(text_emb.astype(dt), deterministic)
        # joint sequence: text pos = zeros (reference :146-147)
        joint = jnp.concatenate([src, text_resized], axis=1)
        joint_pos = jnp.concatenate(
            [pos, jnp.zeros_like(text_resized)], axis=1
        )
        joint_valid = jnp.concatenate([valid, text_valid], axis=1)

        x = joint
        for layer in self.enc_layers:
            x = layer(x, joint_pos, joint_valid, deterministic)
        memory = x
        text_memory = memory[:, h * w :]  # post-encoder text states

        query_pos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None], (B, nq, t.hidden_dim)
        )
        tgt = jnp.zeros_like(query_pos)
        hs = []
        for layer in self.ho_layers:
            tgt = layer(
                tgt, query_pos, memory, joint_pos, joint_valid, deterministic
            )
            hs.append(tgt)
        hs_ho = jnp.stack(hs)
        hs_h, hs_o = hs_ho[:, :, :np_], hs_ho[:, :, np_:]

        verb_qpos = jnp.broadcast_to(
            self.verb_query_embed.astype(dt)[None], (B, np_, t.hidden_dim)
        )
        vt = self.verb_tgt_generator(hs_ho[-1][:, :np_], hs_ho[-1][:, np_:])
        hs_v = []
        for layer in self.verb_layers:
            vt = layer(
                vt, verb_qpos, memory, joint_pos, joint_valid, deterministic
            )
            hs_v.append(vt)
        hs_verb = jnp.stack(hs_v)

        tm = text_memory
        tm = tm / jnp.maximum(
            jnp.linalg.norm(tm.astype(jnp.float32), axis=-1, keepdims=True),
            1e-12,
        ).astype(tm.dtype)
        proj = self.projection_text(tm / 2.0)
        obj_text = proj[:, :n_obj]
        verb_text = proj[:, n_obj:]

        def classify(lvl):
            ol = jnp.einsum(
                "bcd,bed->bce", hs_o[lvl] + self.bias_obj_a.astype(dt),
                obj_text, preferred_element_type=jnp.float32,
            ) + BIAS_C
            vl = jnp.einsum(
                "bcd,bed->bce", hs_verb[lvl] + self.bias_pred_a.astype(dt),
                verb_text, preferred_element_type=jnp.float32,
            ) + BIAS_C
            sb = jax.nn.sigmoid(self.sub_bbox_embed(hs_h[lvl]))
            ob = jax.nn.sigmoid(self.obj_bbox_embed(hs_o[lvl]))
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


class RLIPParSeV1Joint(nn.Module):
    """Faithful RLIP-ParSe v1 wiring (reference
    models/ParSetransformer.py:963-1207 + models/hoi.py:2259-2515):
    joint [image ; resized text] sequence through the post-norm
    CrossModelTransformerEncoder (`--pre_norm` defaults False and no
    script sets it; encoder_norm is None so intermediates are the raw
    layer outputs); the decoders cross-attend the last joint memory and
    apply their shared final norm to every intermediate (torch DETR
    TransformerDecoder semantics); classification layer i reads the text
    slice of encoder intermediate (enc_layers - dec_layers + i) —
    normalized, projected (/2) and einsum'ed with the bias trick; verb
    queries are the PLAIN SUM h[-1] + o[-1] used as query pos with zero
    targets."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        pixels: jnp.ndarray,
        pixel_valid: jnp.ndarray,
        text_emb: jnp.ndarray,  # (B, T, 768) pooled label features
        text_valid: jnp.ndarray,
        n_obj_texts: Optional[int] = None,
        deterministic: bool = True,
        features=None,  # optional (src, pos, valid) bypassing the backbone
        return_states: bool = False,  # parity testing: expose internals
    ):
        from rlipv2_tpu.models.parse import EncoderLayer as PEncoderLayer

        c = self.cfg
        t = c.transformer
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        B = pixels.shape[0]
        n_obj = c.max_obj_texts if n_obj_texts is None else n_obj_texts
        nq = c.num_queries
        np_ = nq // 2

        if features is not None:
            src, pos, valid = features
            src = src.astype(dt)
            pos = pos.astype(dt)
        else:
            feat = ResNet(
                name_variant=c.backbone.name, num_outputs=1, dtype=dt
            )(normalize_pixels(pixels, dt))[-1]
            h, w = feat.shape[1], feat.shape[2]
            mask = downsample_mask(pixel_valid, h, w)
            pos = sine_position_embedding(
                mask, num_pos_feats=t.hidden_dim // 2
            ).astype(dt)
            src = nn.Dense(t.hidden_dim, dtype=dt, name="input_proj")(
                feat
            ).reshape(B, h * w, t.hidden_dim)
            pos = pos.reshape(B, h * w, t.hidden_dim)
            valid = mask.reshape(B, h * w)
        S = src.shape[1]

        text_resized = FeatureResizer(
            t.hidden_dim, dropout=t.dropout, dtype=dt, name="resizer"
        )(text_emb.astype(dt), deterministic)

        joint = jnp.concatenate([src, text_resized], axis=1)
        joint_pos = jnp.concatenate(
            [pos, jnp.zeros_like(text_resized)], axis=1
        )
        joint_valid = jnp.concatenate([valid, text_valid], axis=1)

        # post-norm encoder, no final norm: intermediates are the raw
        # per-layer outputs (reference CrossModelTransformerEncoder with
        # encoder_norm=None, return_intermediate=True)
        x = joint
        inters = []
        for i in range(t.enc_layers):
            x = PEncoderLayer(c, dt, name=f"enc_{i}")(
                x, joint_pos, joint_valid, deterministic
            )
            inters.append(x)
        memory = inters[-1]

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (nq, t.hidden_dim), jnp.float32,
        )
        qpos = jnp.broadcast_to(
            query_embed.astype(dt)[None], (B, nq, t.hidden_dim)
        )
        ho_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ho_decoder_norm")
        verb_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="verb_decoder_norm")
        tgt = jnp.zeros_like(qpos)
        hs = []
        for i in range(t.dec_layers):
            tgt = DecoderLayer(c, dt, name=f"ho_dec_{i}")(
                tgt, qpos, memory, joint_pos, joint_valid, deterministic
            )
            hs.append(ho_norm(tgt))
        hs_ho = jnp.stack(hs)
        hs_h, hs_o = hs_ho[:, :, :np_], hs_ho[:, :, np_:]

        # verb decode: query pos = h[-1] + o[-1] (normed), zero targets
        verb_qpos = hs_h[-1] + hs_o[-1]
        vt = jnp.zeros_like(verb_qpos)
        hs_v = []
        for i in range(t.dec_layers):
            vt = DecoderLayer(c, dt, name=f"verb_dec_{i}")(
                vt, verb_qpos, memory, joint_pos, joint_valid, deterministic
            )
            hs_v.append(verb_norm(vt))
        hs_verb = jnp.stack(hs_v)

        projection_text = nn.Dense(
            t.hidden_dim, dtype=dt, name="projection_text"
        )
        sub_bbox = MLP(t.hidden_dim, 4, 3, dtype=dt, name="sub_bbox_embed")
        obj_bbox = MLP(t.hidden_dim, 4, 3, dtype=dt, name="obj_bbox_embed")
        bias_obj_a = self.param(
            "bias_obj_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )
        bias_pred_a = self.param(
            "bias_pred_a", nn.initializers.zeros, (t.hidden_dim,), jnp.float32
        )

        def classify(lvl):
            # text states from the LAST dec_layers encoder intermediates
            # (reference hoi.py:2406: i_n = i - num_layers indexing)
            tm = inters[t.enc_layers - t.dec_layers + lvl][:, S:]
            tm = tm / jnp.maximum(
                jnp.linalg.norm(
                    tm.astype(jnp.float32), axis=-1, keepdims=True
                ),
                1e-12,
            ).astype(tm.dtype)
            proj = projection_text(tm / 2.0)
            obj_text = proj[:, :n_obj]
            verb_text = proj[:, n_obj:]
            ol = jnp.einsum(
                "bcd,bed->bce", hs_o[lvl] + bias_obj_a.astype(dt), obj_text,
                preferred_element_type=jnp.float32,
            ) + BIAS_C
            vl = jnp.einsum(
                "bcd,bed->bce", hs_verb[lvl] + bias_pred_a.astype(dt),
                verb_text, preferred_element_type=jnp.float32,
            ) + BIAS_C
            sb = jax.nn.sigmoid(sub_bbox(hs_h[lvl]))
            ob = jax.nn.sigmoid(obj_bbox(hs_o[lvl]))
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
        if return_states:
            out["states"] = {
                "hs_ho": hs_ho.astype(jnp.float32),
                "hs_verb": hs_verb.astype(jnp.float32),
                "text_states": jnp.stack(
                    [it[:, S:] for it in inters]
                ).astype(jnp.float32),
            }
        return out
