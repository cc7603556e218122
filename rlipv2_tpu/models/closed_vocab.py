"""Closed-vocabulary HOI baselines: QPIC, CDN, QAHOI.

These are the fixed-class-head members of the reference's legacy model
zoo that the RLIP papers compare against (the open-vocab models replace
the Linear class heads with text einsums):
  * QPIC  = `DETRHOI` (reference: models/hoi.py:3536-3588): vanilla DETR
    encoder/decoder, ONE query set, obj/verb Linear heads + sub/obj box
    MLPs all read from the same decoder states.
  * CDN   = `CDNHOI` (reference: models/hoi.py:2587-2653 + the CDN
    transformer, models/transformer.py): cascade disentangling — the
    human-object decoder's final states seed the interaction decoder's
    query positions; obj class/boxes from the ho states, verbs from the
    interaction states.
  * QAHOI = `DDETRHOI` (reference: models/hoi.py:2655-2838): multi-scale
    deformable encoder + deformable decoder with 2-d reference points,
    same four heads.

Shared pieces: parse.py's dense Encoder/DecoderLayer, deformable.py's
DeformableEncoder, dab_decoder.py's DABHOIDecoder(use_dab=False). Outputs
follow the repo-wide contract (pred_obj_logits carries num_obj+1 columns
with no-object LAST), so SetCriterionHOI / PostProcessHOI work unchanged
with all-ones text-slot masks.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlipv2_tpu.config import ModelConfig
from rlipv2_tpu.models.layers import MLP
from rlipv2_tpu.models.parse import DecoderLayer, EncoderLayer
from rlipv2_tpu.models.parseda import downsample_mask
from rlipv2_tpu.models.resnet import ResNet
from rlipv2_tpu.ops.positional import sine_position_embedding


class _ClosedVocabBase(nn.Module):
    """Backbone + heads shared by the closed-vocab baselines.
    num_obj_classes / num_verb_classes come from max_obj_texts - 1 /
    max_verb_texts so configs stay uniform with the open-vocab models."""

    cfg: ModelConfig

    @property
    def n_obj(self):
        return self.cfg.max_obj_texts - 1

    @property
    def n_verb(self):
        return self.cfg.max_verb_texts

    def setup_common(self):
        c = self.cfg
        t = c.transformer
        self.compute_dtype = (
            jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        )
        dt = self.compute_dtype
        self.backbone = ResNet(
            name_variant=c.backbone.name,
            num_outputs=self.num_levels,
            dtype=dt,
        )
        self.obj_class_embed = nn.Dense(self.n_obj + 1, dtype=dt,
                                        name="obj_class_embed")
        self.verb_class_embed = nn.Dense(self.n_verb, dtype=dt,
                                         name="verb_class_embed")
        self.sub_bbox_embed = MLP(t.hidden_dim, 4, 3, dtype=dt,
                                  name="sub_bbox_embed")
        self.obj_bbox_embed = MLP(t.hidden_dim, 4, 3, dtype=dt,
                                  name="obj_bbox_embed")

    def heads(self, hs_box, hs_verb=None):
        """hs (layers, B, nq, C) -> output dict; verb states default to
        the box states (QPIC reads every head from one decoder)."""
        hs_verb = hs_box if hs_verb is None else hs_verb
        obj_logits = self.obj_class_embed(hs_box).astype(jnp.float32)
        verb_logits = self.verb_class_embed(hs_verb).astype(jnp.float32)
        sub_boxes = jax.nn.sigmoid(self.sub_bbox_embed(hs_box)).astype(
            jnp.float32
        )
        obj_boxes = jax.nn.sigmoid(self.obj_bbox_embed(hs_box)).astype(
            jnp.float32
        )
        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
        }
        if self.cfg.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                for l in range(obj_logits.shape[0] - 1)
            ]
        return out


class QPICModel(_ClosedVocabBase):
    """QPIC (reference DETRHOI, models/hoi.py:3536-3588)."""

    num_levels: int = 1

    def setup(self):
        c = self.cfg
        t = c.transformer
        self.setup_common()
        dt = self.compute_dtype
        self.input_proj = nn.Dense(t.hidden_dim, dtype=dt, name="input_proj")
        self.enc_layers = [
            EncoderLayer(c, dt, name=f"enc_{i}") for i in range(t.enc_layers)
        ]
        self.dec_layers = [
            DecoderLayer(c, dt, name=f"dec_{i}") for i in range(t.dec_layers)
        ]
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (c.num_queries, t.hidden_dim), jnp.float32,
        )

    def _encode(self, pixels, pixel_valid, deterministic):
        t = self.cfg.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        feat = self.backbone(pixels.astype(dt))[-1]
        h, w = feat.shape[1], feat.shape[2]
        mask = downsample_mask(pixel_valid, h, w)
        pos = sine_position_embedding(
            mask, num_pos_feats=t.hidden_dim // 2
        ).astype(dt)
        src = self.input_proj(feat).reshape(B, h * w, t.hidden_dim)
        pos = pos.reshape(B, h * w, t.hidden_dim)
        valid = mask.reshape(B, h * w)
        x = src
        for layer in self.enc_layers:
            x = layer(x, pos, valid, deterministic)
        return x, pos, valid

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        memory, pos, valid = self._encode(pixels, pixel_valid, deterministic)
        qpos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None],
            (B, c.num_queries, t.hidden_dim),
        )
        tgt = jnp.zeros_like(qpos)
        hs = []
        for layer in self.dec_layers:
            tgt = layer(tgt, qpos, memory, pos, valid, deterministic)
            hs.append(tgt)
        return self.heads(jnp.stack(hs))


class CDNModel(QPICModel):
    """CDN (reference CDNHOI + cascade transformer): the interaction
    decoder's query positions are the ho decoder's final states."""

    def setup(self):
        super().setup()
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        self.verb_dec_layers = [
            DecoderLayer(c, dt, name=f"verb_dec_{i}")
            for i in range(t.dec_layers)
        ]

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        memory, pos, valid = self._encode(pixels, pixel_valid, deterministic)
        qpos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None],
            (B, c.num_queries, t.hidden_dim),
        )
        tgt = jnp.zeros_like(qpos)
        hs = []
        for layer in self.dec_layers:
            tgt = layer(tgt, qpos, memory, pos, valid, deterministic)
            hs.append(tgt)
        hs_ho = jnp.stack(hs)
        # cascade: ho states become the verb queries
        vpos = hs_ho[-1]
        vt = jnp.zeros_like(vpos)
        hs_v = []
        for layer in self.verb_dec_layers:
            vt = layer(vt, vpos, memory, pos, valid, deterministic)
            hs_v.append(vt)
        return self.heads(hs_ho, jnp.stack(hs_v))


class QAHOIModel(_ClosedVocabBase):
    """QAHOI (reference DDETRHOI, models/hoi.py:2655-2838): multi-scale
    deformable encoder/decoder with 2-d reference points."""

    num_levels: int = 3

    def setup(self):
        from rlipv2_tpu.models.dab_decoder import DABHOIDecoder
        from rlipv2_tpu.models.deformable import DeformableEncoder

        c = self.cfg
        t = c.transformer
        self.setup_common()
        dt = self.compute_dtype
        projs, norms = [], []
        for i in range(t.num_feature_levels):
            if i < self.num_levels:
                projs.append(
                    nn.Conv(t.hidden_dim, (1, 1), use_bias=True, dtype=dt,
                            name=f"input_proj_{i}")
                )
            else:
                projs.append(
                    nn.Conv(t.hidden_dim, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), use_bias=True, dtype=dt,
                            name=f"input_proj_{i}")
                )
            norms.append(
                nn.GroupNorm(num_groups=32, dtype=dt, name=f"input_norm_{i}")
            )
        self.input_projs = projs
        self.input_norms = norms
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (t.num_feature_levels, t.hidden_dim), jnp.float32,
        )
        self.encoder = DeformableEncoder(t, dtype=dt)
        self.decoder = DABHOIDecoder(
            t, parse=False, use_dab=False, do_self_attn=True,
            refine_boxes=False, dtype=dt,
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (c.num_queries, 2 * t.hidden_dim), jnp.float32,
        )
        self.reference_points = nn.Dense(2, dtype=dt, name="reference_points")

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        from rlipv2_tpu.models.deformable import compute_valid_ratios

        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        feats = self.backbone(pixels.astype(dt))
        srcs, masks, pos_embeds = [], [], []
        for i in range(t.num_feature_levels):
            if i < self.num_levels:
                src = self.input_norms[i](self.input_projs[i](feats[i]))
            elif i == self.num_levels:
                src = self.input_norms[i](self.input_projs[i](feats[-1]))
            else:
                src = self.input_norms[i](self.input_projs[i](srcs[-1]))
            h, w = src.shape[1], src.shape[2]
            mask = downsample_mask(pixel_valid, h, w)
            pos = sine_position_embedding(
                mask, num_pos_feats=t.hidden_dim // 2
            ).astype(dt)
            srcs.append(src)
            masks.append(mask)
            pos_embeds.append(pos)
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate(
            [s.reshape(B, -1, t.hidden_dim) for s in srcs], axis=1
        )
        mask_flat = jnp.concatenate([m.reshape(B, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                (p + self.level_embed[i].astype(dt)).reshape(
                    B, -1, t.hidden_dim
                )
                for i, p in enumerate(pos_embeds)
            ],
            axis=1,
        )
        valid_ratios = compute_valid_ratios(masks)
        memory = self.encoder(
            src_flat, spatial_shapes, valid_ratios, pos_flat, mask_flat,
            deterministic,
        )

        q = jnp.broadcast_to(
            self.query_embed.astype(dt)[None],
            (B, c.num_queries, 2 * t.hidden_dim),
        )
        qpos, tgt = q[..., : t.hidden_dim], q[..., t.hidden_dim :]
        ref = jax.nn.sigmoid(self.reference_points(qpos))  # (B, nq, 2)
        dec = self.decoder(
            tgt,
            ref,
            ref,
            memory,
            spatial_shapes,
            valid_ratios,
            mask_flat,
            deterministic,
            query_pos_in=qpos,
        )
        return self.heads(dec["hs"])
