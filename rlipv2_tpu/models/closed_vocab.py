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
from rlipv2_tpu.models.layers import MLP, normalize_pixels
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

    def _deformable_encode(self, pixels, pixel_valid, deterministic):
        from rlipv2_tpu.models.deformable import compute_valid_ratios

        t = self.cfg.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        feats = self.backbone(normalize_pixels(pixels, dt))
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
        return memory, spatial_shapes, valid_ratios, mask_flat


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
        feat = self.backbone(normalize_pixels(pixels, dt))[-1]
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
                nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt, name=f"input_norm_{i}")
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
        feats = self.backbone(normalize_pixels(pixels, dt))
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


class SepDETRHOIModel(QPICModel):
    """SepDETRHOI (reference models/hoi.py:1295-1349 + the ParSe
    transformer's split decoding): vanilla DETR encoder, ho decoder over
    paired (sub, obj) queries, then a verb decoder whose targets are the
    MBF fusion of the final sub/obj states — the closed-vocabulary
    precursor of ParSe (Linear heads instead of text einsums)."""

    def setup(self):
        from rlipv2_tpu.models.layers import MultiBranchFusion

        super().setup()
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        np_ = c.num_queries // 2
        self.verb_dec_layers = [
            DecoderLayer(c, dt, name=f"verb_dec_{i}")
            for i in range(t.dec_layers)
        ]
        self.verb_query_embed = self.param(
            "verb_query_embed", nn.initializers.normal(1.0),
            (np_, t.hidden_dim), jnp.float32,
        )
        self.verb_tgt_generator = MultiBranchFusion(t.hidden_dim, 16, dtype=dt)

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        nq = c.num_queries
        np_ = nq // 2
        memory, pos, valid = self._encode(pixels, pixel_valid, deterministic)
        qpos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None], (B, nq, t.hidden_dim)
        )
        tgt = jnp.zeros_like(qpos)
        hs = []
        for layer in self.dec_layers:
            tgt = layer(tgt, qpos, memory, pos, valid, deterministic)
            hs.append(tgt)
        hs_ho = jnp.stack(hs)
        hs_h, hs_o = hs_ho[:, :, :np_], hs_ho[:, :, np_:]

        verb_qpos = jnp.broadcast_to(
            self.verb_query_embed.astype(dt)[None], (B, np_, t.hidden_dim)
        )
        vt = self.verb_tgt_generator(hs_ho[-1][:, :np_], hs_ho[-1][:, np_:])
        hs_v = []
        for layer in self.verb_dec_layers:
            vt = layer(vt, verb_qpos, memory, pos, valid, deterministic)
            hs_v.append(vt)
        hs_verb = jnp.stack(hs_v)

        obj_logits = self.obj_class_embed(hs_o).astype(jnp.float32)
        verb_logits = self.verb_class_embed(hs_verb).astype(jnp.float32)
        sub_boxes = jax.nn.sigmoid(self.sub_bbox_embed(hs_h)).astype(jnp.float32)
        obj_boxes = jax.nn.sigmoid(self.obj_bbox_embed(hs_o)).astype(jnp.float32)
        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                for l in range(t.dec_layers - 1)
            ]
        return out


class SepDDETRHOIv3Model(_ClosedVocabBase):
    """SepDDETRHOI v3 (reference models/deformable_transformer.py:29-223
    SepDeformableTransformerHOIv3): multi-scale deformable encoder,
    ParSe-split non-DAB ho decoder with separate sub/obj 2-d reference
    heads, verb decoder over MBF-fused pair states — the closed-vocab
    precursor of ParSeD."""

    num_levels: int = 3

    def setup(self):
        from rlipv2_tpu.models.dab_decoder import DABHOIDecoder
        from rlipv2_tpu.models.deformable import DeformableEncoder
        from rlipv2_tpu.models.layers import MultiBranchFusion

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
                nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dt, name=f"input_norm_{i}")
            )
        self.input_projs = projs
        self.input_norms = norms
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (t.num_feature_levels, t.hidden_dim), jnp.float32,
        )
        self.encoder = DeformableEncoder(t, dtype=dt)
        self.ho_decoder = DABHOIDecoder(
            t, parse=True, use_dab=False, do_self_attn=True,
            refine_boxes=False, dtype=dt,
        )
        self.verb_decoder = DABHOIDecoder(
            t, parse=False, use_dab=False, do_self_attn=True,
            refine_boxes=False, dtype=dt,
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (c.num_queries, 2 * t.hidden_dim), jnp.float32,
        )
        self.reference_points_sub = nn.Dense(
            2, dtype=dt, name="reference_points_sub"
        )
        self.reference_points_obj = nn.Dense(
            2, dtype=dt, name="reference_points_obj"
        )
        self.verb_tgt_generator = MultiBranchFusion(t.hidden_dim, 16, dtype=dt)


    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        nq = c.num_queries
        np_ = nq // 2
        memory, spatial_shapes, valid_ratios, mask_flat = (
            self._deformable_encode(pixels, pixel_valid, deterministic)
        )

        qe = self.query_embed.astype(dt)
        query_pos = jnp.broadcast_to(
            qe[None, :, : t.hidden_dim], (B, nq, t.hidden_dim)
        )
        tgt = jnp.broadcast_to(qe[None, :, t.hidden_dim :], (B, nq, t.hidden_dim))
        sub_ref = jax.nn.sigmoid(self.reference_points_sub(query_pos[:, :np_]))
        obj_ref = jax.nn.sigmoid(self.reference_points_obj(query_pos[:, np_:]))

        ho = self.ho_decoder(
            tgt, sub_ref, obj_ref, memory, spatial_shapes, valid_ratios,
            mask_flat, deterministic, query_pos_in=query_pos,
        )
        hs_ho = ho["hs"]
        hs_h, hs_o = hs_ho[:, :, :np_], hs_ho[:, :, np_:]

        vt = self.verb_tgt_generator(hs_ho[-1][:, :np_], hs_ho[-1][:, np_:])
        verb = self.verb_decoder(
            vt, sub_ref, obj_ref, memory, spatial_shapes, valid_ratios,
            mask_flat, deterministic,
            query_pos_in=query_pos[:, :np_] + query_pos[:, np_:],
        )
        hs_verb = verb["hs"]

        obj_logits = self.obj_class_embed(hs_o).astype(jnp.float32)
        verb_logits = self.verb_class_embed(hs_verb).astype(jnp.float32)
        sub_boxes = jax.nn.sigmoid(self.sub_bbox_embed(hs_h)).astype(jnp.float32)
        obj_boxes = jax.nn.sigmoid(self.obj_bbox_embed(hs_o)).astype(jnp.float32)
        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                for l in range(t.dec_layers - 1)
            ]
        return out


def count_fusion(x, y):
    """Count-sketch style fusion (reference models/hoi.py:299-300)."""
    return jax.nn.relu(x + y) - (x - y) * (x - y)


class SemanticGraph(nn.Module):
    """Verb-semantic graph over word embeddings, `embedded_dot_pro` mode
    (reference models/hoi.py:302-398): single-head scaled dot-product
    attention over the (V, 300) verb embedding table + residual proj."""

    hidden_dim: int = 256
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (V, E)
        d = self.hidden_dim
        for i in range(self.num_layers):
            q = nn.Dense(d, dtype=self.dtype, name=f"semantic_q_{i}")(x)
            k = nn.Dense(d, dtype=self.dtype, name=f"semantic_k_{i}")(x)
            v = nn.Dense(d, dtype=self.dtype, name=f"semantic_v_{i}")(x)
            att = jax.nn.softmax(
                (q @ k.T).astype(jnp.float32) / jnp.sqrt(float(d)), axis=-1
            ).astype(v.dtype)
            agg = jax.nn.relu(att @ v)
            if i == 0:
                x = agg + nn.Dense(
                    d, dtype=self.dtype, name="semantic_proj_res"
                )(x)
            else:
                x = agg + x
        return x


class _BilinearTransformerLayer(nn.Module):
    """Intra-modal enhance layer, `bilinear` relation (reference
    models/hoi.py:467-548): per-head bilinear attention with learned
    coefficient vector, concat heads, bottleneck FFN, residual."""

    hidden_dim: int = 256
    nheads: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (..., nq, C)
        d = self.hidden_dim
        hh = d // self.nheads
        heads = []
        for i in range(self.nheads):
            b1 = nn.Dense(d, dtype=self.dtype, name=f"bilinear1_{i}")(x)
            b2 = nn.Dense(d, dtype=self.dtype, name=f"bilinear2_{i}")(x)
            coef = self.param(
                f"coef_{i}",
                nn.initializers.constant(1.0 / jnp.sqrt(float(d))),
                (d,), jnp.float32,
            )
            b1 = b1 * coef.astype(b1.dtype)
            att = jax.nn.softmax(
                jnp.einsum("...cd,...ed->...ce", b1, b2).astype(jnp.float32),
                axis=-1,
            ).astype(x.dtype)
            emb = nn.Dense(hh, dtype=self.dtype, name=f"W3_{i}")(x)
            heads.append(jnp.einsum("...ce,...ef->...cf", att, emb))
        cat = jnp.concatenate(heads, axis=-1)
        # bilinear mode: W2/W1 are d -> d (reference models/hoi.py:483-486;
        # the 2d bottleneck belongs to the embedded_dot_pro mode only)
        cat = nn.Dense(d, dtype=self.dtype, name="W2")(cat)
        cat = jax.nn.relu(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(cat)
        )
        return x + nn.Dense(d, dtype=self.dtype, name="W1")(cat)


class _MHCrossAttLayer(nn.Module):
    """Inter-modal calibration, `GClike` relation (reference
    models/hoi.py:668-745): squeeze-excite style cross gating between
    vision (vx) and semantic (sx) streams."""

    hidden_dim: int = 256
    nheads: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vx, sx):
        d = self.hidden_dim
        hh = d // self.nheads

        def branch(x_self, x_other, tag):
            outs = []
            for i in range(self.nheads):
                gate = jax.nn.sigmoid(
                    nn.Dense(hh, dtype=self.dtype, name=f"{tag}_ex_{i}")(
                        jax.nn.relu(
                            nn.Dense(
                                hh, dtype=self.dtype, name=f"{tag}_sq_{i}"
                            )(x_other)
                        )
                    )
                )
                outs.append(
                    gate
                    * nn.Dense(hh, dtype=self.dtype, name=f"{tag}_W3_{i}")(
                        x_self
                    )
                )
            cat = jnp.concatenate(outs, axis=-1)
            cat = nn.Dense(d, dtype=self.dtype, name=f"{tag}_W2")(cat)
            cat = jax.nn.relu(
                nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"{tag}_ln"
                )(cat)
            )
            return x_self + nn.Dense(d, dtype=self.dtype, name=f"{tag}_W1")(cat)

        return branch(vx, sx, "vision"), branch(sx, vx, "semantic")


class OCNModel(QPICModel):
    """OCN — Object-guided Cross-modal Calibration Network (reference
    models/hoi.py:1048-1240): QPIC-style vanilla DETR HOI detection plus
    (1) a SemanticGraph over verb word embeddings, (2) statistical-prior
    aggregation through the object-verb co-occurrence matrix gathered at
    the argmax object class, (3) CrossModalCalibration (inter GC-like
    cross attention + intra bilinear layers), (4) count_fusion of the
    calibrated vision/semantic streams feeding the verb head.

    The verb word-embedding table and the co-occurrence prior are module
    parameters (uniform / random init) so the checkpoint converter can
    inject the reference's GloVe table and
    `datasets/priors/obj_verb_cooccurrence.npz` (with the reference's
    Laplace smoothing applied by the loader, tools/convert_annotations.py)."""

    word_dim: int = 300

    def setup(self):
        super().setup()
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        self.verb_word_embedding = self.param(
            "verb_word_embedding", nn.initializers.normal(1.0),
            (self.n_verb, self.word_dim), jnp.float32,
        )
        self.obj_verb_co = self.param(
            "obj_verb_co",
            nn.initializers.constant(1.0 / self.n_verb),
            (self.n_obj + 1, self.n_verb), jnp.float32,
        )
        self.semantic_graph = SemanticGraph(t.hidden_dim, 1, dtype=dt)
        self.cross_att = _MHCrossAttLayer(t.hidden_dim, 2, dtype=dt)
        self.vision_intra = _BilinearTransformerLayer(t.hidden_dim, 2, dtype=dt)
        self.semantic_intra = _BilinearTransformerLayer(
            t.hidden_dim, 2, dtype=dt
        )
        self.fusion_1 = nn.Dense(t.hidden_dim, dtype=dt, name="fusion_1")
        self.fusion_2 = nn.Dense(t.hidden_dim, dtype=dt, name="fusion_2")

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
        hs = jnp.stack(hs)  # (layers, B, nq, C)

        # word-embedding table, L2-normalized (reference norm_tensor).
        # Frozen buffer in the reference (register_buffer) — param here
        # only for converter injection; stop_gradient preserves that.
        emb = jax.lax.stop_gradient(self.verb_word_embedding)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
        )
        semantic = self.semantic_graph(emb.astype(dt))  # (V, C)

        obj_logits = self.obj_class_embed(hs).astype(jnp.float32)
        sub_boxes = jax.nn.sigmoid(self.sub_bbox_embed(hs)).astype(jnp.float32)
        obj_boxes = jax.nn.sigmoid(self.obj_bbox_embed(hs)).astype(jnp.float32)

        # statistical-prior aggregation at the argmax object class
        obj_idx = jnp.argmax(obj_logits, axis=-1)  # (layers, B, nq)
        co = jnp.take(
            jax.lax.stop_gradient(self.obj_verb_co), obj_idx, axis=0
        )  # (l, B, nq, V)
        semantic_aug = jnp.einsum(
            "lbqv,vc->lbqc", co.astype(dt), semantic
        )
        cross_hs, cross_sem = self.cross_att(hs, semantic_aug)
        cross_hs = self.vision_intra(cross_hs)
        cross_sem = self.semantic_intra(cross_sem)
        hs_aug = count_fusion(self.fusion_1(cross_hs), self.fusion_2(cross_sem))
        verb_logits = self.verb_class_embed(hs_aug).astype(jnp.float32)

        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                for l in range(t.dec_layers - 1)
            ]
        return out


class SeqDETRHOIModel(QPICModel):
    """SeqDETRHOI (reference models/hoi.py:1242-1294 + SeqTransformer,
    models/transformer.py:331-412): three CHAINED decoders — human, then
    object (query pos = final human states), then verb (query pos = final
    object states); sub boxes from the human stack, obj class/box from the
    object stack, verbs from the verb stack."""

    def setup(self):
        super().setup()
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        self.obj_dec_layers = [
            DecoderLayer(c, dt, name=f"obj_dec_{i}")
            for i in range(t.dec_layers)
        ]
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

        def run(layers, qpos):
            tgt = jnp.zeros_like(qpos)
            hs = []
            for layer in layers:
                tgt = layer(tgt, qpos, memory, pos, valid, deterministic)
                hs.append(tgt)
            return jnp.stack(hs)

        qpos = jnp.broadcast_to(
            self.query_embed.astype(dt)[None],
            (B, c.num_queries, t.hidden_dim),
        )
        hs_h = run(self.dec_layers, qpos)
        hs_o = run(self.obj_dec_layers, hs_h[-1])
        hs_v = run(self.verb_dec_layers, hs_o[-1])

        obj_logits = self.obj_class_embed(hs_o).astype(jnp.float32)
        verb_logits = self.verb_class_embed(hs_v).astype(jnp.float32)
        sub_boxes = jax.nn.sigmoid(self.sub_bbox_embed(hs_h)).astype(jnp.float32)
        obj_boxes = jax.nn.sigmoid(self.obj_bbox_embed(hs_o)).astype(jnp.float32)
        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                for l in range(t.dec_layers - 1)
            ]
        return out


class StochasticDETRHOIModel(QPICModel):
    """VanillaStochasticDETRHOI (reference models/hoi.py:181-300): QPIC
    plus a verb latent head — (mu, log_var) linear heads, `sampling_num`
    reparameterized draws through the verb classifier averaged and added
    residually to the deterministic verb logits. The KL term against
    N(0, 1) is exposed as `verb_kl_divergence` for the aux-KL criterion
    (reference VanillaStochasticDETRHOIauxkl, :57-179)."""

    sampling_num: int = 5

    def setup(self):
        super().setup()
        t = self.cfg.transformer
        dt = self.compute_dtype
        self.latent_mu = nn.Dense(t.hidden_dim, dtype=dt, name="latent_mu")
        self.latent_log_var = nn.Dense(
            t.hidden_dim, dtype=dt, name="latent_log_var"
        )

    def __call__(self, pixels, pixel_valid, deterministic: bool = True,
                 rng_key=None):
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
        hs = jnp.stack(hs)

        obj_logits = self.obj_class_embed(hs).astype(jnp.float32)
        sub_boxes = jax.nn.sigmoid(self.sub_bbox_embed(hs)).astype(jnp.float32)
        obj_boxes = jax.nn.sigmoid(self.obj_bbox_embed(hs)).astype(jnp.float32)
        res_verb = self.verb_class_embed(hs).astype(jnp.float32)

        mu = self.latent_mu(hs)
        log_var = self.latent_log_var(hs)
        if rng_key is None:
            rng_key = self.make_rng("stochastic") if self.has_rng(
                "stochastic"
            ) else jax.random.PRNGKey(0)
        eps = jax.random.normal(
            rng_key, (self.sampling_num,) + mu.shape, mu.dtype
        )
        latent = mu[None] + jnp.exp(0.5 * log_var)[None] * eps
        verb_logits = jnp.mean(
            self.verb_class_embed(latent).astype(jnp.float32), axis=0
        ) + res_verb

        # KL(N(mu, sigma) || N(0, 1)) per layer, mean over (B, nq, C)
        kl = -0.5 * jnp.mean(
            1 + log_var.astype(jnp.float32)
            - mu.astype(jnp.float32) ** 2
            - jnp.exp(log_var.astype(jnp.float32)),
            axis=(1, 2, 3),
        )  # (layers,)

        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
            "verb_kl_divergence": kl[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                    "verb_kl_divergence": kl[l],
                }
                for l in range(t.dec_layers - 1)
            ]
        return out


class ParSeDABDDETRModel(SepDDETRHOIv3Model):
    """ParSeDABDDETR (reference models/hoi.py:1592-1870): DAB-deformable
    closed-vocab HOI — learned content targets + verb targets + 4-d
    anchor refpoints (sub || obj), in-decoder iterative box refinement
    (use_dab=True), verb decoder over MBF-fused pair states at the final
    refined anchors, per-layer Linear heads; boxes come from the
    decoder's refined references."""

    def setup(self):
        from rlipv2_tpu.models.dab_decoder import DABHOIDecoder
        from rlipv2_tpu.models.layers import MultiBranchFusion

        c = self.cfg
        t = c.transformer
        # shares backbone/projections/encoder with the non-DAB variant
        super().setup()
        dt = self.compute_dtype
        self.ho_decoder_dab = DABHOIDecoder(
            t, parse=True, use_dab=True, do_self_attn=True,
            refine_boxes=True, dtype=dt,
        )
        self.verb_decoder_dab = DABHOIDecoder(
            t, parse=False, use_dab=True, do_self_attn=True,
            refine_boxes=False, dtype=dt,
        )
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0),
            (c.num_queries, t.hidden_dim), jnp.float32,
        )
        self.verb_tgt_embed = self.param(
            "verb_tgt_embed", nn.initializers.normal(1.0),
            (c.num_queries, t.hidden_dim), jnp.float32,
        )
        self.refpoint_embed = self.param(
            "refpoint_embed", nn.initializers.uniform(1.0),
            (c.num_queries, 4), jnp.float32,
        )
        self.verb_mbf = MultiBranchFusion(t.hidden_dim, 16, dtype=dt)

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        nq = c.num_queries
        np_ = nq // 2
        memory, spatial_shapes, valid_ratios, mask_flat = (
            self._deformable_encode(pixels, pixel_valid, deterministic)
        )

        refs = jax.nn.sigmoid(self.refpoint_embed.astype(dt))
        sub_ref = jnp.broadcast_to(refs[None, :np_], (B, np_, 4))
        obj_ref = jnp.broadcast_to(refs[None, np_:], (B, np_, 4))
        tgt = jnp.broadcast_to(
            self.tgt_embed.astype(dt)[None], (B, nq, t.hidden_dim)
        )

        ho = self.ho_decoder_dab(
            tgt, sub_ref, obj_ref, memory, spatial_shapes, valid_ratios,
            mask_flat, deterministic,
        )
        hs_ho = ho["hs"]
        hs_h, hs_o = hs_ho[:, :, :np_], hs_ho[:, :, np_:]

        verb_tgt = self.verb_tgt_embed.astype(dt)
        vt = (
            self.verb_mbf(hs_ho[-1][:, :np_], hs_ho[-1][:, np_:])
            + verb_tgt[None, :np_]
            + verb_tgt[None, np_:]
        )
        verb = self.verb_decoder_dab(
            vt, ho["sub_refs"][-1], ho["obj_refs"][-1], memory,
            spatial_shapes, valid_ratios, mask_flat, deterministic,
        )
        hs_verb = verb["hs"]

        obj_logits = self.obj_class_embed(hs_o).astype(jnp.float32)
        verb_logits = self.verb_class_embed(hs_verb).astype(jnp.float32)
        sub_boxes = ho["sub_boxes"].astype(jnp.float32)
        obj_boxes = ho["obj_boxes"].astype(jnp.float32)
        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                for l in range(t.dec_layers - 1)
            ]
        return out


def gen_encoder_output_proposals(memory, valid, spatial_shapes, base_scale=0.05):
    """Two-stage proposal generation (reference
    models/deformable_transformer.py:106-134): per level a pixel-center
    grid normalized by the VALID extent with wh = 0.05 * 2^lvl, proposals
    kept when every coordinate lies in (0.01, 0.99); returns the
    inverse-sigmoid proposals with +inf on invalid/padded slots and the
    memory zeroed there. Static shapes: the per-level grids are traced
    constants."""
    B, S, C = memory.shape
    proposals = []
    off = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        m = valid[:, off : off + h * w].reshape(B, h, w)
        valid_h = jnp.maximum(
            jnp.sum(m[:, :, 0].astype(jnp.float32), axis=1), 1.0
        )
        valid_w = jnp.maximum(
            jnp.sum(m[:, 0, :].astype(jnp.float32), axis=1), 1.0
        )
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (hw, 2)
        scale = jnp.stack([valid_w, valid_h], -1)[:, None, :]  # (B, 1, 2)
        ctr = (grid[None] + 0.5) / scale
        wh = jnp.full_like(ctr, base_scale * (2.0 ** lvl))
        proposals.append(jnp.concatenate([ctr, wh], axis=-1))
        off += h * w
    prop = jnp.concatenate(proposals, axis=1)  # (B, S, 4)
    ok = jnp.all((prop > 0.01) & (prop < 0.99), axis=-1)  # (B, S)
    prop = jnp.log(prop / (1.0 - prop))
    keep = ok & valid
    prop = jnp.where(keep[..., None], prop, jnp.inf)
    mem = jnp.where(keep[..., None], memory, 0.0)
    return mem, prop, keep


class QAHOITwoStageModel(QAHOIModel):
    """QAHOI with the reference's two-stage query initialization
    (models/deformable_transformer.py:176-191): encoder output proposals
    scored by an encoder-level class head, top-k proposals become the
    decoder reference points and their sine embeddings seed (query_pos,
    tgt) through pos_trans. Exposes `enc_outputs` for the two-stage aux
    loss."""

    def setup(self):
        super().setup()
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        self.enc_output = nn.Dense(t.hidden_dim, dtype=dt, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="enc_output_norm")
        self.enc_class = nn.Dense(self.n_obj + 1, dtype=dt, name="enc_class")
        self.enc_bbox = MLP(t.hidden_dim, 4, 3, dtype=dt, name="enc_bbox")
        self.pos_trans = nn.Dense(
            2 * t.hidden_dim, dtype=dt, name="pos_trans"
        )
        self.pos_trans_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="pos_trans_norm")

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        from rlipv2_tpu.ops.positional import gen_sineembed_for_position

        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        nq = min(c.two_stage_num_proposals, c.num_queries)
        memory, spatial_shapes, valid_ratios, mask_flat = (
            self._deformable_encode(pixels, pixel_valid, deterministic)
        )

        mem0, prop, keep = gen_encoder_output_proposals(
            memory.astype(jnp.float32), mask_flat, spatial_shapes
        )
        out_mem = self.enc_output_norm(self.enc_output(mem0.astype(dt)))
        enc_logits = self.enc_class(out_mem).astype(jnp.float32)
        enc_coords = (
            self.enc_bbox(out_mem).astype(jnp.float32) + prop
        )  # unactivated; +inf on invalid slots
        score = jnp.where(keep, enc_logits[..., 0], -jnp.inf)
        _, topk_idx = jax.lax.top_k(score, nq)  # (B, nq)
        topk_coords = jnp.take_along_axis(
            enc_coords, topk_idx[..., None], axis=1
        )  # (B, nq, 4)
        topk_coords = jax.lax.stop_gradient(topk_coords)
        refs = jax.nn.sigmoid(topk_coords)

        pos_embed = gen_sineembed_for_position(
            refs, dim=t.hidden_dim // 2
        ).astype(dt)  # (B, nq, 2*hidden)
        pt = self.pos_trans_norm(self.pos_trans(pos_embed))
        query_pos, tgt = jnp.split(pt, 2, axis=-1)

        # like the base QAHOI: one reference per query (the decoder's
        # midpoint of (refs, refs) is refs itself)
        dec = self.decoder(
            tgt,
            refs,
            refs,
            memory,
            spatial_shapes,
            valid_ratios,
            mask_flat,
            deterministic,
            query_pos_in=query_pos,
        )
        out = self.heads(dec["hs"])
        # two-stage aux (reference: the encoder proposal head is trained
        # with the detection losses, models/deformable_transformer.py:689)
        finite_coords = jnp.where(
            jnp.isfinite(enc_coords), enc_coords, 0.0
        )
        out["enc_outputs"] = {
            "pred_logits": enc_logits,
            "pred_boxes": jax.nn.sigmoid(finite_coords),
            "proposal_valid": keep,
        }
        return out


class IterativeDETRHOIModel(QPICModel):
    """IterativeTransformer-backed DETRHOI (reference
    models/transformer.py:545-609, built via --IterativeDETRHOI at
    transformer.py:1114-1125): QPIC plus a 4-d `reference_points` linear
    over the query embeddings. The reference's DETRHOI wrapper consumes
    only the decoder states (models/hoi.py:3563 indexes `[0]`), leaving
    the reference points vestigial; they are exposed as `ref_points`
    (raw linear outputs, reference transformer.py:602) for parity."""

    def setup(self):
        super().setup()
        self.reference_points = nn.Dense(
            4, dtype=self.compute_dtype, name="reference_points"
        )

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        out = super().__call__(pixels, pixel_valid, deterministic)
        qe = self.query_embed.astype(self.compute_dtype)
        rp = self.reference_points(qe).astype(jnp.float32)  # (nq, 4)
        out["ref_points"] = jnp.broadcast_to(
            rp[None], (pixels.shape[0],) + rp.shape
        )
        return out


def _bilinear_sample_2d(x, py, px):
    """x (B, h, w, C); py/px (B, h, w) fractional positions -> (B, h, w, C)
    with zeros outside (torchvision DeformConv2d zero-padding semantics)."""
    B, h, w, C = x.shape
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        g = x[
            jnp.arange(B)[:, None, None],
            jnp.clip(yi, 0, h - 1),
            jnp.clip(xi, 0, w - 1),
        ]
        return jnp.where(valid[..., None], g, 0.0)

    return (
        tap(y0, x0) * (1 - fx) * (1 - fy)
        + tap(y0, x0 + 1) * fx * (1 - fy)
        + tap(y0 + 1, x0) * (1 - fx) * fy
        + tap(y0 + 1, x0 + 1) * fx * fy
    )


class DETRHOIhmModel(QPICModel):
    """Transformerhm-backed DETRHOI (reference models/transformer.py:611-678,
    built via --DETRHOIhm at transformer.py:1126-1137): the encoder memory
    feeds a heatmap branch — 3x3 conv + relu, an offset-predicting 3x3 conv,
    and a 3x3 deformable conv (torchvision DeformConv2d; here expressed as
    nine bilinear taps, the TPU-friendly gather formulation) — whose
    sigmoid heatmap seeds the decoder: the top-num_queries locations'
    deformed features become the query position embeddings (tgt zeros).
    Output carries `verb_hm` = (heatmap (B, n_hm, h, w), mask) consumed by
    criterion.loss_verb_hm (reference models/hoi.py:4244-4258)."""

    num_hm_classes: int = 1

    def setup(self):
        super().setup()
        t = self.cfg.transformer
        dt = self.compute_dtype
        d = t.hidden_dim
        self.hm_conv = nn.Conv(d, (3, 3), padding=1, dtype=dt, name="hm_conv")
        self.hm_off = nn.Conv(18, (3, 3), padding=1, dtype=dt, name="hm_off")
        self.hm_embed = nn.Dense(self.num_hm_classes, dtype=dt,
                                 name="hm_embed")
        # deformable 3x3 kernel, torch conv layout transposed to
        # (tap, C_in, C_out) for per-tap matmuls
        self.hm_deform_kernel = self.param(
            "hm_deform_kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (9, d, d), jnp.float32,
        )
        self.hm_deform_bias = self.param(
            "hm_deform_bias", nn.initializers.zeros, (d,), jnp.float32
        )

    def _deform_conv3x3(self, x, off):
        B, h, w, C = x.shape
        gy, gx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        out = jnp.zeros_like(x)
        k = 0
        W = self.hm_deform_kernel.astype(x.dtype)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                py = gy[None] + dy + off[..., 2 * k]
                px = gx[None] + dx + off[..., 2 * k + 1]
                out = out + _bilinear_sample_2d(x, py, px) @ W[k]
                k += 1
        return out + self.hm_deform_bias.astype(x.dtype)

    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        B = pixels.shape[0]
        memory, pos, valid = self._encode(pixels, pixel_valid, deterministic)

        feat = self.backbone(normalize_pixels(pixels, dt))[-1]
        h, w = feat.shape[1], feat.shape[2]
        mem2d = memory.reshape(B, h, w, t.hidden_dim)
        hm_feat = nn.relu(self.hm_conv(mem2d))
        off = self.hm_off(hm_feat).astype(jnp.float32)
        deform_feat = self._deform_conv3x3(hm_feat, off)  # (B, h, w, C)

        verb_hm = jax.nn.sigmoid(
            self.hm_embed(hm_feat).astype(jnp.float32)
        )  # (B, h, w, n_hm)
        # _topk with n_hm=1 == plain top-K over the spatial map
        # (reference models/decode.py:74-90)
        flat_hm = verb_hm.max(axis=-1).reshape(B, h * w)
        masked_hm = jnp.where(valid, flat_hm, -1.0)
        # k clamped statically to the map size (real inputs have
        # h*w >> nq; tiny maps tile the top locations round-robin)
        k = min(c.num_queries, h * w)
        _, inds = jax.lax.top_k(masked_hm, k)
        if k < c.num_queries:
            inds = jnp.tile(inds, (1, -(-c.num_queries // k)))[:, : c.num_queries]
        qpos = jnp.take_along_axis(
            deform_feat.reshape(B, h * w, t.hidden_dim),
            inds[..., None], axis=1,
        ).astype(dt)

        tgt = jnp.zeros_like(qpos)
        hs = []
        for layer in self.dec_layers:
            tgt = layer(tgt, qpos, memory, pos, valid, deterministic)
            hs.append(tgt)
        out = self.heads(jnp.stack(hs))
        out["verb_hm"] = (
            verb_hm.transpose(0, 3, 1, 2),  # (B, n_hm, h, w) torch layout
            ~downsample_mask(pixel_valid, h, w),
        )
        return out


class CoupledDETRHOIModel(QPICModel):
    """TransformerCoupled-backed DETRHOI (reference
    models/transformer.py:683-829, unreferenced by any build in the
    reference but part of its transformer zoo): a vanilla DETR stack
    whose decoder COUPLES verb prediction into the query stream. After
    every decoder layer, the normed state's argmax object class gathers
    a row of the object-verb co-occurrence prior, that row aggregates a
    verb-semantic table (self-attention over word embeddings WITHOUT
    softmax, reference transformer.py:780-782), and a sigmoid gate blends
    the semantic aggregate back into the query state, which feeds BOTH
    the per-layer verb head and the next decoder layer.

    Like OCN, the word-embedding table and the smoothed co-occurrence
    prior are parameters so the converter can inject the reference's
    word2vec table and `datasets/priors/obj_verb_cooccurrence.npz`."""

    word_dim: int = 300

    def setup(self):
        super().setup()
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        self.verb_word_embedding = self.param(
            "verb_word_embedding", nn.initializers.normal(1.0),
            (self.n_verb, self.word_dim), jnp.float32,
        )
        self.obj_verb_co = self.param(
            "obj_verb_co",
            nn.initializers.constant(1.0 / self.n_verb),
            (self.n_obj + 1, self.n_verb), jnp.float32,
        )
        self.semantic_q = nn.Dense(t.hidden_dim, dtype=dt, name="semantic_q")
        self.semantic_k = nn.Dense(t.hidden_dim, dtype=dt, name="semantic_k")
        self.semantic_v = nn.Dense(t.hidden_dim, dtype=dt, name="semantic_v")
        self.semantic_proj_res = nn.Dense(
            t.hidden_dim, dtype=dt, name="semantic_proj_res"
        )
        self.semantic_gate = nn.Dense(
            t.hidden_dim, dtype=dt, name="semantic_gate"
        )
        self.verb_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="verb_norm")
        self.dec_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="dec_norm")

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

        # verb-semantic table: un-softmaxed self-attention + residual
        # projection (reference transformer.py:780-782). The word2vec
        # table and the co-occurrence prior are frozen buffers in the
        # reference (register_buffer, transformer.py:760,765) — they are
        # params here only so the converter can inject them; stop_gradient
        # keeps training from drifting them away from the injected values.
        emb = jax.lax.stop_gradient(self.verb_word_embedding).astype(dt)
        att = jnp.einsum("ac,bc->ab", self.semantic_q(emb), self.semantic_k(emb))
        semantic = jax.nn.relu(att @ self.semantic_v(emb)) + self.semantic_proj_res(emb)

        tgt = jnp.zeros_like(qpos)
        hs, obj_logits_l, verb_logits_l = [], [], []
        for layer in self.dec_layers:
            tgt = layer(tgt, qpos, memory, pos, valid, deterministic)
            normed = self.dec_norm(tgt)
            obj_logits = self.obj_class_embed(normed).astype(jnp.float32)
            obj_idx = jnp.argmax(obj_logits, axis=-1)  # (B, nq)
            co = jnp.take(
                jax.lax.stop_gradient(self.obj_verb_co), obj_idx, axis=0
            )  # (B, nq, V)
            semantic_aug = jnp.einsum("bqv,vc->bqc", co.astype(dt), semantic)
            gate = jax.nn.sigmoid(self.semantic_gate(normed))
            tgt = gate * semantic_aug + normed  # feeds the next layer too
            verb_logits = self.verb_class_embed(
                self.verb_norm(tgt)
            ).astype(jnp.float32)
            # the reference's intermediate stack holds norm(layer_output)
            # PRE-blend per layer; only the final entry is replaced by
            # norm(output_aug) post-blend (intermediate.pop()/append(),
            # reference transformer.py:799-800,820-824) — box heads read
            # this stack, so the blend never reaches intermediate-layer
            # box predictions
            hs.append(normed)
            obj_logits_l.append(obj_logits)
            verb_logits_l.append(verb_logits)

        hs[-1] = self.dec_norm(tgt)
        hs = jnp.stack(hs)
        sub_boxes = jax.nn.sigmoid(self.sub_bbox_embed(hs)).astype(jnp.float32)
        obj_boxes = jax.nn.sigmoid(self.obj_bbox_embed(hs)).astype(jnp.float32)
        out = {
            "pred_obj_logits": obj_logits_l[-1],
            "pred_verb_logits": verb_logits_l[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
        }
        if c.aux_loss:
            out["aux_outputs"] = [
                {
                    "pred_obj_logits": obj_logits_l[l],
                    "pred_verb_logits": verb_logits_l[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                for l in range(t.dec_layers - 1)
            ]
        return out
