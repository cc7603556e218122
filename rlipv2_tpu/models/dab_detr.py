"""ParSe DAB-DETR: non-deformable DAB (Dynamic Anchor Box) HOI model.

Capability parity with the reference's DAB-DETR family
(`ParSeDABDETR`, models/hoi.py:1421-1590; `ParSeDABTransformer` +
conditional decoder, models/DAB/transformer.py:71-178, 277-420, 575-700):
  * 4-d anchor boxes per query (`refpoint_embed`, (2*n_pairs, 4)), split
    (sub || obj), refined per layer through shared sub/obj box MLPs with
    `tmp[..., :4] += inverse_sigmoid(ref)` and stop-gradient between
    layers;
  * per-layer anchor sine embeddings -> `ref_point_head` MLP -> query
    positional embedding; conditional `query_scale` MLP (cond_elewise)
    scales the sine embedding from layer 2 on;
  * modulated HW attention: `ref_anchor_head` predicts (w, h) conditions
    that rescale the x/y halves of the sine embedding by ref_w/w, ref_h/h;
  * conditional (concat) cross-attention: per head the query is
    [content | sine-pos] and the key is [content | key-pos], so attention
    logits = content·content + pos·pos (Conditional-DETR); the first
    layer additionally adds `ca_qpos_proj(query_pos)` to the content;
  * verb path: a VANILLA decoder whose query pos is a linear projection
    of the summed final (h + o) states (DAB/transformer.py:138-176).

TPU-first notes: batch-major (B, nq, C) everywhere; the concat attention
is einsum'd per head with the doubled head dim (2*hd) — one fused QK
matmul on the MXU, no torch MultiheadAttention emulation; anchors update
with `lax.stop_gradient` exactly where the reference `.detach()`es.
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
from rlipv2_tpu.ops.positional import (
    gen_sineembed_for_position,
    inverse_sigmoid,
    sine_position_embedding,
)


class ConditionalDecoderLayer(nn.Module):
    """DAB/Conditional-DETR decoder layer with concat cross-attention
    (reference models/DAB/transformer.py:575-700)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, query_sine_embed, memory, pos,
                 mem_valid, is_first, deterministic=True):
        t = self.cfg.transformer
        d = t.hidden_dim
        nh = t.nheads
        hd = d // nh
        dt = self.dtype
        B, nq = tgt.shape[0], tgt.shape[1]
        S = memory.shape[1]

        def dense(name):
            return nn.Dense(d, dtype=dt, name=name)

        # self-attention with separate content/pos projections
        q = dense("sa_qcontent_proj")(tgt) + dense("sa_qpos_proj")(query_pos)
        k = dense("sa_kcontent_proj")(tgt) + dense("sa_kpos_proj")(query_pos)
        v = dense("sa_v_proj")(tgt)
        qh = q.reshape(B, nq, nh, hd)
        kh = k.reshape(B, nq, nh, hd)
        vh = v.reshape(B, nq, nh, hd)
        logits = jnp.einsum(
            "bqnc,bknc->bnqk", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(hd))
        att = jax.nn.softmax(logits, axis=-1).astype(dt)
        sa = jnp.einsum("bnqk,bknc->bqnc", att, vh).reshape(B, nq, d)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")(
            tgt + nn.Dropout(t.dropout)(sa, deterministic=deterministic)
        )

        # conditional cross-attention: per-head concat [content | pos]
        q_content = dense("ca_qcontent_proj")(tgt)
        if is_first:
            q_content = q_content + dense("ca_qpos_proj")(query_pos)
        k_content = dense("ca_kcontent_proj")(memory)
        k_pos = dense("ca_kpos_proj")(pos)
        v = dense("ca_v_proj")(memory)
        q_sine = dense("ca_qpos_sine_proj")(query_sine_embed)

        qh = jnp.concatenate(
            [q_content.reshape(B, nq, nh, hd), q_sine.reshape(B, nq, nh, hd)],
            axis=-1,
        )  # (B, nq, nh, 2hd)
        kh = jnp.concatenate(
            [k_content.reshape(B, S, nh, hd), k_pos.reshape(B, S, nh, hd)],
            axis=-1,
        )
        vh = v.reshape(B, S, nh, hd)
        logits = jnp.einsum(
            "bqnc,bknc->bnqk", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(2 * hd))
        if mem_valid is not None:
            logits = jnp.where(
                mem_valid[:, None, None, :], logits, jnp.asarray(-1e9)
            )
        att = jax.nn.softmax(logits, axis=-1).astype(dt)
        ca = jnp.einsum("bnqk,bknc->bqnc", att, vh).reshape(B, nq, d)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")(
            tgt + nn.Dropout(t.dropout)(ca, deterministic=deterministic)
        )

        ff = nn.Dense(t.dim_feedforward, dtype=dt, name="linear1")(tgt)
        ff = nn.Dropout(t.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(d, dtype=dt, name="linear2")(ff)
        return nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm3")(
            tgt + nn.Dropout(t.dropout)(ff, deterministic=deterministic)
        )


class ParSeDABDETR(nn.Module):
    """DAB-DETR with the ParSe (sub || obj) split and a vanilla verb
    decoder; closed-vocabulary Linear heads."""

    cfg: ModelConfig
    modulate_hw_attn: bool = True

    @property
    def n_obj(self):
        return self.cfg.max_obj_texts - 1

    @property
    def n_verb(self):
        return self.cfg.max_verb_texts

    @nn.compact
    def __call__(self, pixels, pixel_valid, deterministic: bool = True):
        c = self.cfg
        t = c.transformer
        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        B = pixels.shape[0]
        nq = c.num_queries
        np_ = nq // 2
        d = t.hidden_dim

        feat = ResNet(name_variant=c.backbone.name, num_outputs=1, dtype=dt)(
            normalize_pixels(pixels, dt)
        )[-1]
        h, w = feat.shape[1], feat.shape[2]
        mask = downsample_mask(pixel_valid, h, w)
        pos = sine_position_embedding(mask, num_pos_feats=d // 2).astype(dt)
        src = nn.Dense(d, dtype=dt, name="input_proj")(feat).reshape(B, -1, d)
        posf = pos.reshape(B, -1, d)
        valid = mask.reshape(B, -1)

        x = src
        for i in range(t.enc_layers):
            x = EncoderLayer(c, dt, name=f"enc_{i}")(x, posf, valid, deterministic)
        memory = x

        refpoints = self.param(
            "refpoint_embed", nn.initializers.uniform(1.0), (nq, 4), jnp.float32
        )
        ref = jax.nn.sigmoid(
            jnp.broadcast_to(refpoints[None], (B, nq, 4))
        ).astype(jnp.float32)

        ref_point_head = MLP(d, d, 2, dtype=dt, name="ref_point_head")
        query_scale = MLP(d, d, 2, dtype=dt, name="query_scale")
        ref_anchor_head = (
            MLP(d, 2, 2, dtype=dt, name="ref_anchor_head")
            if self.modulate_hw_attn
            else None
        )
        sub_bbox_embed = MLP(d, 4, 3, dtype=dt, name="sub_bbox_embed")
        obj_bbox_embed = MLP(d, 4, 3, dtype=dt, name="obj_bbox_embed")

        tgt = jnp.zeros((B, nq, d), dt)
        hs = []
        refs_out = [ref]
        for lid in range(t.dec_layers):
            center = ref  # (B, nq, 4)
            sine = gen_sineembed_for_position(
                center.astype(jnp.float32), dim=d // 2
            ).astype(dt)  # (B, nq, 2*d)
            query_pos = ref_point_head(sine)
            scale = 1.0 if lid == 0 else query_scale(tgt)
            q_sine = sine[..., :d] * scale
            if ref_anchor_head is not None:
                cond = jax.nn.sigmoid(ref_anchor_head(tgt))  # (B, nq, 2)
                wy = (cond[..., 1:2] / jnp.maximum(center[..., 3:4], 1e-6)).astype(dt)
                wx = (cond[..., 0:1] / jnp.maximum(center[..., 2:3], 1e-6)).astype(dt)
                q_sine = jnp.concatenate(
                    [q_sine[..., : d // 2] * wy, q_sine[..., d // 2 :] * wx],
                    axis=-1,
                )
            tgt = ConditionalDecoderLayer(c, dt, name=f"dec_{lid}")(
                tgt, query_pos, q_sine, memory, posf, valid,
                lid == 0, deterministic,
            )
            hs.append(tgt)
            # iterative anchor update with the ParSe split
            sub_tmp = sub_bbox_embed(tgt[:, :np_])
            obj_tmp = obj_bbox_embed(tgt[:, np_:])
            tmp = jnp.concatenate([sub_tmp, obj_tmp], axis=1).astype(jnp.float32)
            new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(ref))
            refs_out.append(new_ref)
            ref = jax.lax.stop_gradient(new_ref)
        hs = jnp.stack(hs)  # (layers, B, nq, C)
        hs_h, hs_o = hs[:, :, :np_], hs[:, :, np_:]

        # verb decoder: vanilla, query pos = Linear(h + o final states)
        verb_qpos = nn.Dense(d, dtype=dt, name="verb_refpoint")(
            hs_h[-1] + hs_o[-1]
        )
        vt = jnp.zeros_like(verb_qpos)
        hs_v = []
        for i in range(t.dec_layers):
            vt = DecoderLayer(c, dt, name=f"verb_dec_{i}")(
                vt, verb_qpos, memory, posf, valid, deterministic
            )
            hs_v.append(vt)
        hs_v = jnp.stack(hs_v)

        obj_logits = nn.Dense(self.n_obj + 1, dtype=dt, name="obj_class_embed")(
            hs_o
        ).astype(jnp.float32)
        verb_logits = nn.Dense(self.n_verb, dtype=dt, name="verb_class_embed")(
            hs_v
        ).astype(jnp.float32)
        boxes = jnp.stack(refs_out[1:])  # per-layer refined anchors
        sub_boxes, obj_boxes = boxes[:, :, :np_], boxes[:, :, np_:]

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
