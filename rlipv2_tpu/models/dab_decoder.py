"""DAB (dynamic anchor box) deformable decoders for ParSe HOI decoding.

Parity map (reference: models/dab_deformable/deformable_transformer.py):
  * DeformableTransformerDecoderLayer (:1346-1402): optional standard
    self-attention, MSDeformAttn cross-attention, FFN — post-LN.
  * DABDeformableTransformerDecoderHOI (:1404-1649):
      - ParSe mode (ho decoder): queries = [subjects ‖ objects], each half
        with its own 4-d anchor; per-layer anchor sine embedding
        (gen_sineembed of the first level's scaled anchors) → ref_point_head
        MLP → query_pos, scaled by query_scale(output) from layer 1 on;
        iterative refinement via per-layer sub/obj box MLPs with
        stop-gradient between layers (:1510-1562).
      - verb mode (ParSe=False, sequential decoding): the cross-attention
        reference box is the midpoint 0.5*(sub+obj) of the (continuously
        refined) subject/object anchors (:1455-1456).

Design note (TPU-first): the reference wires the box heads in from the top
model post-hoc ("hack implementation for iterative bounding box
refinement"). Here the heads live inside the decoder, and the decoder
returns per-layer box predictions directly — mathematically identical
(layer-l prediction == pre-stop-gradient refined anchor), so the top model
never re-runs the heads.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlipv2_tpu.config import TransformerConfig
from rlipv2_tpu.models.layers import MLP, MSDeformAttention
from rlipv2_tpu.ops.positional import gen_sineembed_for_position, inverse_sigmoid


class DeformableDecoderLayer(nn.Module):
    cfg: TransformerConfig
    do_self_attn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt,  # (B, nq, C)
        query_pos,  # (B, nq, C) or None
        reference_points,  # (B, nq, L, 4) scaled by valid ratios
        src,  # (B, S, C) encoder memory
        spatial_shapes,
        src_valid_mask=None,  # (B, S) True = real
        deterministic=True,
    ):
        c = self.cfg

        def with_pos(x):
            return x if query_pos is None else x + query_pos

        if self.do_self_attn:
            sa = nn.MultiHeadDotProductAttention(
                num_heads=c.nheads,
                dropout_rate=c.dropout,
                dtype=self.dtype,
                name="self_attn",
            )(
                inputs_q=with_pos(tgt),
                inputs_k=with_pos(tgt),
                inputs_v=tgt,
                deterministic=deterministic,
            )
            tgt = tgt + nn.Dropout(c.dropout)(sa, deterministic=deterministic)
            tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        ca = MSDeformAttention(
            d_model=c.hidden_dim,
            n_levels=c.num_feature_levels,
            n_heads=c.nheads,
            n_points=c.dec_n_points,
            dtype=self.dtype,
            impl=c.msda_impl,
            name="cross_attn",
        )(with_pos(tgt), reference_points, src, spatial_shapes, src_valid_mask)
        tgt = tgt + nn.Dropout(c.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        ff = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.Dropout(c.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(c.hidden_dim, dtype=self.dtype, name="linear2")(ff)
        tgt = tgt + nn.Dropout(c.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)


class DABHOIDecoder(nn.Module):
    """Deformable ParSe decoder shared by the ho path (parse=True) and verb
    path (parse=False), in DAB mode (use_dab=True: 4-d anchors + anchor
    sine query pos) or plain-deformable mode (use_dab=False: 2-d reference
    points + learned query pos, the non-DAB `TransformerDecoderHOI`,
    reference models/deformable_transformer.py:390-483)."""

    cfg: TransformerConfig
    parse: bool = True
    do_self_attn: bool = True
    refine_boxes: bool = True  # with_box_refine
    use_dab: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, nq, C); verb mode: (B, n_pairs, C)
        sub_ref: jnp.ndarray,  # (B, n_pairs, 4) anchors or (B, n_pairs, 2)
        obj_ref: jnp.ndarray,
        src: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[tuple[int, int]],
        valid_ratios: jnp.ndarray,  # (B, L, 2)
        src_valid_mask=None,
        deterministic: bool = True,
        query_pos_in: jnp.ndarray | None = None,  # non-DAB learned pos
    ):
        c = self.cfg
        n_pairs = sub_ref.shape[1]
        ref_dim = sub_ref.shape[-1]
        vr4 = jnp.concatenate([valid_ratios, valid_ratios], axis=-1)  # (B, L, 4)
        vr = vr4 if ref_dim == 4 else valid_ratios

        if self.use_dab:
            # shared across layers (reference: one ref_point_head /
            # query_scale per decoder, dab_deformable/…:1419-1424)
            ref_point_head = MLP(c.hidden_dim, c.hidden_dim, 2, dtype=self.dtype, name="ref_point_head")
            query_scale = MLP(c.hidden_dim, c.hidden_dim, 2, dtype=self.dtype, name="query_scale")

        hs = []
        sub_refs_out = []
        obj_refs_out = []
        sub_boxes = []
        obj_boxes = []
        output = tgt
        for lid in range(c.dec_layers):
            if self.parse:
                ref_sub_in = sub_ref[:, :, None] * vr[:, None]  # (B, np, L, d)
                ref_obj_in = obj_ref[:, :, None] * vr[:, None]
                ref_input = jnp.concatenate([ref_sub_in, ref_obj_in], axis=1)
            else:
                ref_input = (0.5 * (sub_ref + obj_ref))[:, :, None] * vr[:, None]

            if self.use_dab:
                sine = gen_sineembed_for_position(ref_input[:, :, 0, :], dim=c.hidden_dim // 2)
                raw_query_pos = ref_point_head(sine)
                pos_scale = query_scale(output) if lid != 0 else 1.0
                query_pos = pos_scale * raw_query_pos
            else:
                query_pos = query_pos_in

            output = DeformableDecoderLayer(
                c, do_self_attn=self.do_self_attn, dtype=self.dtype, name=f"layer_{lid}"
            )(
                output,
                query_pos,
                ref_input,
                src,
                spatial_shapes,
                src_valid_mask,
                deterministic,
            )

            if self.refine_boxes:
                assert ref_dim == 4, "in-decoder refinement needs 4-d anchors"
                sub_in = output[:, :n_pairs] if self.parse else output
                obj_in = output[:, n_pairs:] if self.parse else output
                sub_delta = MLP(
                    c.hidden_dim, 4, 3, dtype=self.dtype, name=f"sub_bbox_embed_{lid}"
                )(sub_in)
                obj_delta = MLP(
                    c.hidden_dim, 4, 3, dtype=self.dtype, name=f"obj_bbox_embed_{lid}"
                )(obj_in)
                new_sub = jax.nn.sigmoid(sub_delta + inverse_sigmoid(sub_ref))
                new_obj = jax.nn.sigmoid(obj_delta + inverse_sigmoid(obj_ref))
                sub_boxes.append(new_sub)  # gradient flows to this layer only
                obj_boxes.append(new_obj)
                sub_ref = jax.lax.stop_gradient(new_sub)
                obj_ref = jax.lax.stop_gradient(new_obj)

            hs.append(output)
            sub_refs_out.append(sub_ref)
            obj_refs_out.append(obj_ref)

        result = {
            "hs": jnp.stack(hs),  # (layers, B, nq, C)
            "sub_refs": jnp.stack(sub_refs_out),  # (layers, B, np, 4) detached
            "obj_refs": jnp.stack(obj_refs_out),
        }
        if self.refine_boxes:
            result["sub_boxes"] = jnp.stack(sub_boxes)  # (layers, B, np, 4) with grad
            result["obj_boxes"] = jnp.stack(obj_boxes)
        return result
