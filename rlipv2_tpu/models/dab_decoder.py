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

Design notes (TPU-first):
  * the reference wires the box heads in from the top model post-hoc
    ("hack implementation for iterative bounding box refinement"). Here the
    heads live inside the decoder, and the decoder returns per-layer box
    predictions directly — mathematically identical (layer-l prediction ==
    pre-stop-gradient refined anchor), so the top model never re-runs them.
  * the per-layer stack (decoder layer + the two box-head MLPs) runs under
    `nn.scan` with params stacked on a leading (dec_layers, ...) axis at
    "layers" — one traced layer body instead of dec_layers HLO copies
    (VERDICT r4 next #1c; the same treatment RoBERTa/ALIF got in r4).
    `ref_point_head` / `query_scale` are genuinely shared across layers in
    the reference (one instance per decoder, dab_deformable/…:1419-1424),
    so their param subtrees live on the parent (same tree paths as before)
    and are threaded through the scan as broadcast inputs, applied
    functionally. The layer-0 "no query scaling" special case becomes a
    `jnp.where(is_first, 1, query_scale(output))` select — gradients flow
    only through the selected branch, so training is bit-identical.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from rlipv2_tpu.config import TransformerConfig
from rlipv2_tpu.ops.int8_dense import dense
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
            int8_dense=c.int8_dense,
            name="cross_attn",
        )(with_pos(tgt), reference_points, src, spatial_shapes, src_valid_mask)
        tgt = tgt + nn.Dropout(c.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        ff = dense(
            c.dim_feedforward, int8=c.int8_dense, dtype=self.dtype,
            name="linear1",
        )(tgt)
        ff = nn.Dropout(c.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = dense(
            c.hidden_dim, int8=c.int8_dense, dtype=self.dtype, name="linear2"
        )(ff)
        tgt = tgt + nn.Dropout(c.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)


def _mlp_apply(params, x, num_layers):
    """Functionally apply an `MLP`'s param subtree (shared across scanned
    decoder layers; the params live on the parent module)."""
    for i in range(num_layers):
        p = params[f"layers_{i}"]
        x = x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)
        if i < num_layers - 1:
            x = nn.relu(x)
    return x


def _shared_mlp_init(in_dim, hidden_dim, out_dim, num_layers, dtype):
    def init(rng):
        dummy = jnp.zeros((1, 1, in_dim), dtype)
        mlp = MLP(hidden_dim, out_dim, num_layers, dtype=dtype)
        return flax.core.unfreeze(mlp.init(rng, dummy))["params"]

    return init


class DABDecoderBlock(nn.Module):
    """One scanned decoder step: query-pos generation (DAB mode), the
    deformable decoder layer, and (refine mode) the per-layer sub/obj box
    heads with stop-gradient anchor refinement."""

    cfg: TransformerConfig
    parse: bool = True
    do_self_attn: bool = True
    refine_boxes: bool = True
    use_dab: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        carry,  # (output, sub_ref, obj_ref)
        is_first,  # () bool — scanned: True only on layer 0
        rp_params,  # ref_point_head params (broadcast) or None
        qs_params,  # query_scale params (broadcast) or None
        vr,  # (B, L, d) valid ratios (d == ref dim)
        src,
        spatial_shapes,
        src_valid_mask,
        query_pos_in,  # non-DAB learned pos (broadcast) or None
        deterministic,
    ):
        c = self.cfg
        output, sub_ref, obj_ref = carry
        n_pairs = sub_ref.shape[1]

        if self.parse:
            ref_sub_in = sub_ref[:, :, None] * vr[:, None]  # (B, np, L, d)
            ref_obj_in = obj_ref[:, :, None] * vr[:, None]
            ref_input = jnp.concatenate([ref_sub_in, ref_obj_in], axis=1)
        else:
            ref_input = (0.5 * (sub_ref + obj_ref))[:, :, None] * vr[:, None]

        if self.use_dab:
            sine = gen_sineembed_for_position(
                ref_input[:, :, 0, :], dim=c.hidden_dim // 2
            )
            raw_query_pos = _mlp_apply(rp_params, sine, 2)
            # layer 0 uses scale 1 (reference :1529); later layers scale by
            # query_scale(output). where() keeps one traced body and zeroes
            # the unselected branch's gradient, matching the unrolled math.
            pos_scale = jnp.where(
                is_first, 1.0, _mlp_apply(qs_params, output, 2)
            )
            query_pos = pos_scale * raw_query_pos
        else:
            query_pos = query_pos_in

        output = DeformableDecoderLayer(
            c, do_self_attn=self.do_self_attn, dtype=self.dtype, name="layer"
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
            sub_in = output[:, :n_pairs] if self.parse else output
            obj_in = output[:, n_pairs:] if self.parse else output
            sub_delta = MLP(
                c.hidden_dim, 4, 3, dtype=self.dtype, name="sub_bbox_embed"
            )(sub_in)
            obj_delta = MLP(
                c.hidden_dim, 4, 3, dtype=self.dtype, name="obj_bbox_embed"
            )(obj_in)
            new_sub = jax.nn.sigmoid(sub_delta + inverse_sigmoid(sub_ref))
            new_obj = jax.nn.sigmoid(obj_delta + inverse_sigmoid(obj_ref))
            sub_ref = jax.lax.stop_gradient(new_sub)
            obj_ref = jax.lax.stop_gradient(new_obj)
            # gradient flows into new_sub/new_obj from this layer only
            ys = (output, sub_ref, obj_ref, new_sub, new_obj)
        else:
            ys = (output, sub_ref, obj_ref)
        return (output, sub_ref, obj_ref), ys


class DABHOIDecoder(nn.Module):
    """Deformable ParSe decoder shared by the ho path (parse=True) and verb
    path (parse=False), in DAB mode (use_dab=True: 4-d anchors + anchor
    sine query pos) or plain-deformable mode (use_dab=False: 2-d reference
    points + learned query pos, the non-DAB `TransformerDecoderHOI`,
    reference models/deformable_transformer.py:390-483).

    Layers run under `nn.scan` (params stacked at "layers"); the shared
    `ref_point_head` / `query_scale` MLPs keep their original param paths
    on this module.
    """

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
        ref_dim = sub_ref.shape[-1]
        if self.refine_boxes:
            assert ref_dim == 4, "in-decoder refinement needs 4-d anchors"
        vr4 = jnp.concatenate([valid_ratios, valid_ratios], axis=-1)  # (B, L, 4)
        vr = vr4 if ref_dim == 4 else valid_ratios

        rp_params = qs_params = None
        if self.use_dab:
            # shared across layers (reference: one ref_point_head /
            # query_scale per decoder, dab_deformable/…:1419-1424); the
            # param subtrees keep the exact pre-scan tree paths
            # sine embedding width: ref_dim coords x (hidden_dim // 2) each
            rp_params = self.param(
                "ref_point_head",
                _shared_mlp_init(
                    ref_dim * (c.hidden_dim // 2), c.hidden_dim,
                    c.hidden_dim, 2, self.dtype,
                ),
            )
            qs_params = self.param(
                "query_scale",
                _shared_mlp_init(
                    c.hidden_dim, c.hidden_dim, c.hidden_dim, 2, self.dtype
                ),
            )

        Scan = nn.scan(
            DABDecoderBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,) + (nn.broadcast,) * 8,
            length=c.dec_layers,
            # see RobertaModel: RLIPV2_SCAN_UNROLL=1 unrolls for honest
            # flop counting in bench.py's MFU line
            unroll=(
                c.dec_layers
                if os.environ.get("RLIPV2_SCAN_UNROLL") == "1"
                else 1
            ),
        )
        is_first = jnp.arange(c.dec_layers) == 0
        _, ys = Scan(
            c,
            parse=self.parse,
            do_self_attn=self.do_self_attn,
            refine_boxes=self.refine_boxes,
            use_dab=self.use_dab,
            dtype=self.dtype,
            name="layers",
        )(
            (tgt, sub_ref, obj_ref),
            is_first,
            rp_params,
            qs_params,
            vr,
            src,
            spatial_shapes,
            src_valid_mask,
            query_pos_in,
            deterministic,
        )

        if self.refine_boxes:
            hs, sub_refs_out, obj_refs_out, sub_boxes, obj_boxes = ys
        else:
            hs, sub_refs_out, obj_refs_out = ys
        result = {
            "hs": hs,  # (layers, B, nq, C)
            "sub_refs": sub_refs_out,  # (layers, B, np, 4) detached
            "obj_refs": obj_refs_out,
        }
        if self.refine_boxes:
            result["sub_boxes"] = sub_boxes  # (layers, B, np, 4) with grad
            result["obj_boxes"] = obj_boxes
        return result
