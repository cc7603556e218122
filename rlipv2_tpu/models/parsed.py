"""RLIP-ParSeD (v2): deformable non-DAB open-vocab model.

Capability parity with `RLIP_ParSeD` + `RLIP_ParSeDTransformer_v2`
(reference: models/hoi.py:2840-3316, models/ParSetransformer.py:404-917):
same ALIF fused encoding as ParSeDA, but queries are a learned
`query_embed` split into (query_pos, tgt) with 2-d reference points from
separate `reference_points_sub/obj` linear heads (reference
:857-870); the verb decoder's reference is the sub/obj midpoint; box heads
run at the top per decoder layer with `tmp[..., :2] += inverse_sigmoid(ref)`
(reference models/hoi.py:3080-3120); classification is the same einsum
bias-trick head.

Shares `_encode` and the classification head with RLIPParSeDA — only the
query/decoder wiring differs.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlipv2_tpu.models.dab_decoder import DABHOIDecoder
from rlipv2_tpu.models.layers import MLP
from rlipv2_tpu.models.parseda import BIAS_C, RLIPParSeDA
from rlipv2_tpu.ops.positional import inverse_sigmoid


class RLIPParSeD(RLIPParSeDA):
    """cfg.use_dab is ignored; this class is the non-DAB variant."""

    def setup(self):
        super().setup()
        c = self.cfg
        t = c.transformer
        dt = self.compute_dtype
        # (nq, 2C): [query_pos || tgt] like Deformable-DETR
        self.query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (c.num_queries, 2 * t.hidden_dim),
            jnp.float32,
        )
        self.reference_points_sub = nn.Dense(2, dtype=dt, name="reference_points_sub")
        self.reference_points_obj = nn.Dense(2, dtype=dt, name="reference_points_obj")
        # top-level per-layer box heads (no in-decoder refinement)
        self.sub_bbox_embeds = [
            MLP(t.hidden_dim, 4, 3, dtype=dt, name=f"sub_bbox_embed_{i}")
            for i in range(t.dec_layers)
        ]
        self.obj_bbox_embeds = [
            MLP(t.hidden_dim, 4, 3, dtype=dt, name=f"obj_bbox_embed_{i}")
            for i in range(t.dec_layers)
        ]
        self.ho_decoder_nd = DABHOIDecoder(
            t, parse=True, do_self_attn=True, refine_boxes=False, use_dab=False,
            dtype=dt,
        )
        self.verb_decoder_nd = DABHOIDecoder(
            t, parse=False, do_self_attn=True, refine_boxes=False, use_dab=False,
            dtype=dt,
        )

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

        enc = self._encode(pixels, pixel_valid, text_emb, text_valid, deterministic)
        text_dec = enc["text_dec"]

        qe = self.query_embed.astype(dt)
        query_pos = jnp.broadcast_to(qe[None, :, : t.hidden_dim], (B, nq, t.hidden_dim))
        tgt = jnp.broadcast_to(qe[None, :, t.hidden_dim :], (B, nq, t.hidden_dim))
        sub_ref = jax.nn.sigmoid(self.reference_points_sub(query_pos[:, :np_]))
        obj_ref = jax.nn.sigmoid(self.reference_points_obj(query_pos[:, np_:]))

        ho = self.ho_decoder_nd(
            tgt, sub_ref, obj_ref, enc["img_memory"], enc["spatial_shapes"],
            enc["valid_ratios"], enc["mask_flat"], deterministic,
            query_pos_in=query_pos,
        )
        hs_ho = ho["hs"]
        hs_h, hs_o = hs_ho[:, :, :np_], hs_ho[:, :, np_:]

        # verb queries (vanilla_MBF as in ParSeDA)
        verb_tgt = self.verb_tgt_embed.astype(dt)
        hs_last = hs_ho[-1]
        merge_verb_tgt = (
            self.verb_tgt_generator(hs_last[:, :np_], hs_last[:, np_:])
            + verb_tgt[None, :np_]
            + verb_tgt[None, np_:]
        )
        verb = self.verb_decoder_nd(
            merge_verb_tgt, sub_ref, obj_ref, enc["img_memory"],
            enc["spatial_shapes"], enc["valid_ratios"], enc["mask_flat"],
            deterministic,
            query_pos_in=query_pos[:, :np_] + query_pos[:, np_:],
        )
        hs_verb = verb["hs"]

        # top-level boxes: tmp[..., :2] += inverse_sigmoid(2-d ref)
        inv_sub = inverse_sigmoid(sub_ref)
        inv_obj = inverse_sigmoid(obj_ref)
        sub_boxes, obj_boxes = [], []
        for l in range(t.dec_layers):
            st = self.sub_bbox_embeds[l](hs_h[l])
            ot = self.obj_bbox_embeds[l](hs_o[l])
            st = st.at[..., :2].add(inv_sub)
            ot = ot.at[..., :2].add(inv_obj)
            sub_boxes.append(jax.nn.sigmoid(st))
            obj_boxes.append(jax.nn.sigmoid(ot))
        sub_boxes = jnp.stack(sub_boxes).astype(jnp.float32)
        obj_boxes = jnp.stack(obj_boxes).astype(jnp.float32)

        # classification: same einsum bias-trick head as ParSeDA
        def classify(lvl):
            tm = text_dec[lvl]
            tm = tm / jnp.maximum(
                jnp.linalg.norm(tm.astype(jnp.float32), axis=-1, keepdims=True), 1e-12
            ).astype(tm.dtype)
            proj = self.projection_text(tm / 2.0)
            obj_text = proj[:, :n_obj]
            pred_text = proj[:, n_obj:]
            ol = jnp.einsum(
                "bcd,bed->bce", hs_o[lvl] + self.bias_obj_a.astype(dt), obj_text,
                preferred_element_type=jnp.float32,
            ) + BIAS_C
            vl = jnp.einsum(
                "bcd,bed->bce", hs_verb[lvl] + self.bias_pred_a.astype(dt), pred_text,
                preferred_element_type=jnp.float32,
            ) + BIAS_C
            sl = None
            if c.subject_class:
                sl = jnp.einsum(
                    "bcd,bed->bce", hs_h[lvl] + self.bias_obj_a.astype(dt), obj_text,
                    preferred_element_type=jnp.float32,
                ) + BIAS_C
            return ol, vl, sl

        outs = [classify(l) for l in range(t.dec_layers)]
        obj_logits = jnp.stack([o for o, _, _ in outs]).astype(jnp.float32)
        verb_logits = jnp.stack([v for _, v, _ in outs]).astype(jnp.float32)

        out = {
            "pred_obj_logits": obj_logits[-1],
            "pred_verb_logits": verb_logits[-1],
            "pred_sub_boxes": sub_boxes[-1],
            "pred_obj_boxes": obj_boxes[-1],
            # last verb-decoder layer's hidden states for the uniformity
            # analysis eval (reference: models/hoi.py:2173)
            "verb_decoder_out": hs_verb[-1].astype(jnp.float32),
        }
        if c.subject_class:
            sub_logits = jnp.stack([s for _, _, s in outs]).astype(jnp.float32)
            out["pred_sub_logits"] = sub_logits[-1]
        if c.aux_loss:
            aux = []
            for l in range(t.dec_layers - 1):
                a = {
                    "pred_obj_logits": obj_logits[l],
                    "pred_verb_logits": verb_logits[l],
                    "pred_sub_boxes": sub_boxes[l],
                    "pred_obj_boxes": obj_boxes[l],
                }
                if c.subject_class:
                    a["pred_sub_logits"] = sub_logits[l]
                aux.append(a)
            out["aux_outputs"] = aux
        return out
