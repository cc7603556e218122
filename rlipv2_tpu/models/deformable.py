"""Deformable transformer encoder + the ALIF (Asymmetric Language-Image
Fusion) encoder.

Parity map:
  * DeformableTransformerEncoderLayer — reference
    models/deformable_transformer.py:719-758 (MSDeformAttn self-attention
    over the flattened multi-level token axis + FFN, post-LN).
  * grid reference points — reference models/deformable_transformer.py:768-780
    (pixel-center grid normalized by the *valid* extent of each level).
  * RLIPv2_DeformableTransformerEncoder (ALIF) — reference
    models/deformable_transformer.py:791-884: every `fusion_interval`-th
    layer first runs a VLFuse bi-attention (optionally restricted to the
    last feature level, `fusion_last_vis`) and ONE RoBERTa layer on the
    language path (sparsified language encoding); `lang_aux_loss` stacks the
    per-fusion language states so each decoder layer gets its own text
    memory.

TPU-first notes: spatial shapes are static python tuples, so the per-level
reference-point grid is built at trace time with static concatenations; the
`fusion_last_vis` token slice is a static slice (last level's start offset
is a compile-time constant). Optional remat of the fusion block replaces
torch.utils.checkpoint.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from rlipv2_tpu.config import TextEncoderConfig, TransformerConfig
from rlipv2_tpu.models.fusion import BiAttentionBlock
from rlipv2_tpu.ops.int8_dense import dense
from rlipv2_tpu.models.layers import MSDeformAttention
from rlipv2_tpu.models.roberta import RobertaLayer, alif_additive_bool_mask


def encoder_reference_points(
    spatial_shapes: Sequence[tuple[int, int]],
    valid_ratios: jnp.ndarray,  # (B, L, 2) as (w_ratio, h_ratio)
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Pixel-center grid per level, normalized by valid extent, then scaled
    by every level's valid ratio: returns (B, S, L, 2)."""
    B = valid_ratios.shape[0]
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ref_y = (jnp.arange(h, dtype=dtype) + 0.5)  # (h,)
        ref_x = (jnp.arange(w, dtype=dtype) + 0.5)  # (w,)
        ry = jnp.tile(ref_y[:, None], (1, w)).reshape(-1)  # (h*w,)
        rx = jnp.tile(ref_x[None, :], (h, 1)).reshape(-1)
        ry = ry[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = rx[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], axis=-1))  # (B, h*w, 2)
    ref = jnp.concatenate(refs, axis=1)  # (B, S, 2)
    return ref[:, :, None, :] * valid_ratios[:, None, :, :]


def compute_valid_ratios(valid_masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-level (B, h, w) validity masks -> (B, L, 2) (w_ratio, h_ratio)."""
    ratios = []
    for m in valid_masks:
        h, w = m.shape[1], m.shape[2]
        # clamp to >=1 valid row/col: an all-padded image (possible in a
        # ragged last batch) must not produce 0-ratios -> NaN ref points
        valid_h = jnp.maximum(jnp.sum(m[:, :, 0].astype(jnp.float32), axis=1), 1.0)
        valid_w = jnp.maximum(jnp.sum(m[:, 0, :].astype(jnp.float32), axis=1), 1.0)
        ratios.append(jnp.stack([valid_w / w, valid_h / h], axis=-1))
    return jnp.stack(ratios, axis=1)


class DeformableEncoderLayer(nn.Module):
    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32
    scan_mode: bool = False  # return (carry, ys) for nn.scan

    @nn.compact
    def __call__(
        self,
        src,  # (B, S, C)
        pos,  # (B, S, C)
        reference_points,  # (B, S, L, 2)
        spatial_shapes,
        valid_mask=None,  # (B, S) True = real
        deterministic=True,
    ):
        c = self.cfg
        attn_out = MSDeformAttention(
            d_model=c.hidden_dim,
            n_levels=c.num_feature_levels,
            n_heads=c.nheads,
            n_points=c.enc_n_points,
            dtype=self.dtype,
            impl=c.msda_impl,
            int8_dense=c.int8_dense,
            name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes, valid_mask)
        # tag for the selective remat policy (save_only_these_names in
        # ALIFEncoder): the deformable-attention kernel is ~8x the cost of
        # the rest of the layer, so the backward recompute keeps its
        # output (~95 MB bf16/layer at 832x1344 bs8) instead of re-running
        # it. No-op when the layer is not under nn.remat.
        attn_out = checkpoint_name(attn_out, "msda_out")
        src = src + nn.Dropout(c.dropout)(attn_out, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)

        ff = dense(
            c.dim_feedforward, int8=c.int8_dense, dtype=self.dtype,
            name="linear1",
        )(src)
        ff = nn.Dropout(c.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = dense(
            c.hidden_dim, int8=c.int8_dense, dtype=self.dtype, name="linear2"
        )(ff)
        # optional remat-policy tag (cfg.remat_save_names A/B)
        ff = checkpoint_name(ff, "enc_ffn_out")
        src = src + nn.Dropout(c.dropout)(ff, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)
        if self.scan_mode:
            return src, None
        return src


class DeformableEncoder(nn.Module):
    """Plain DDETR encoder (fusion_type == no_fusion path).

    The identical layers run under nn.scan (params stacked on a leading
    (enc_layers, ...) axis at "layers"): one traced layer body instead of
    enc_layers HLO copies (VERDICT r3 next #1b)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, spatial_shapes, valid_ratios, pos, valid_mask, deterministic=True):
        refs = encoder_reference_points(spatial_shapes, valid_ratios, src.dtype)
        import os

        Scan = nn.scan(
            DeformableEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast,) * 5,
            length=self.cfg.enc_layers,
            unroll=(
                self.cfg.enc_layers
                if os.environ.get("RLIPV2_SCAN_UNROLL") == "1"
                else 1
            ),
        )
        out, _ = Scan(self.cfg, self.dtype, scan_mode=True, name="layers")(
            src, pos, refs, spatial_shapes, valid_mask, deterministic
        )
        return out


class ALIFBlock(nn.Module):
    """One ALIF super-block: VLFuse bi-attention + ONE RobertaLayer on the
    language path + `fusion_interval` deformable layers.

    This is the repeating unit of the reference's ALIF encoder
    (models/deformable_transformer.py:791-884: fusion fires before every
    layer with idx % fusion_interval == 0). nn.scan traces it ONCE with
    params stacked on a leading (enc_layers // fusion_interval, ...) axis,
    shrinking the encoder HLO ~n_blocks-fold (VERDICT r3 next #1b). Carry
    is (visual tokens, language hidden); ys collects the per-fusion
    language state for lang_aux_loss."""

    cfg: TransformerConfig
    text_cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        carry,  # (out (B,S,C), lang (B,T,l_dim))
        pos,
        refs,
        spatial_shapes,
        valid_mask,
        lang_valid,
        last_start,  # static int: flattened offset of the last level
        deterministic,
    ):
        out, lang = carry
        c = self.cfg
        f = c.fusion

        if f.fusion_last_vis:
            v_part = out[:, last_start:]
            pos_part = pos[:, last_start:]
            maskv_part = valid_mask[:, last_start:]
        else:
            v_part, pos_part, maskv_part = out, pos, valid_mask

        block = BiAttentionBlock(
            cfg=f,
            v_dim=c.hidden_dim,
            l_dim=self.text_cfg.hidden_size,
            num_feature_levels=c.num_feature_levels,
            dtype=self.dtype,
            int8_dense=c.int8_dense,
            name="vl_fuse",
        )
        if f.use_checkpoint_fusion:
            fused_v, lang = nn.remat(type(block).__call__)(
                block, v_part, lang, pos_part, lang_valid, maskv_part,
                deterministic,
            )
        else:
            fused_v, lang = block(
                v_part, lang, pos_part, lang_valid, maskv_part, deterministic
            )
        if f.fusion_last_vis:
            out = jnp.concatenate([out[:, :last_start], fused_v], axis=1)
        else:
            out = fused_v

        # sparsified language path: ONE roberta layer per fusion, with the
        # reference's additive-bool mask quirk
        lang = RobertaLayer(self.text_cfg, self.dtype, name="lang_layer")(
            lang, alif_additive_bool_mask(lang_valid, self.dtype), deterministic
        )

        for j in range(f.fusion_interval):
            layer = DeformableEncoderLayer(c, self.dtype, name=f"layer_{j}")
            if c.remat_encoder:
                out = nn.remat(
                    type(layer).__call__,
                    static_argnums=(4, 6),  # spatial_shapes, deterministic
                    policy=jax.checkpoint_policies.save_only_these_names(
                        *c.remat_save_names
                    ),
                )(layer, out, pos, refs, spatial_shapes, valid_mask,
                  deterministic)
            else:
                out = layer(
                    out, pos, refs, spatial_shapes, valid_mask, deterministic
                )
        return (out, lang), lang


class ALIFEncoder(nn.Module):
    """Interleaved [VLFuse + RobertaLayer] / deformable-layer encoder,
    scanned over identical super-blocks (requires enc_layers divisible by
    fusion_interval, which every reference config satisfies: canonical
    enc 6 / interval 2)."""

    cfg: TransformerConfig
    text_cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[tuple[int, int]],
        valid_ratios: jnp.ndarray,  # (B, L, 2)
        pos: jnp.ndarray,  # (B, S, C)
        valid_mask: jnp.ndarray,  # (B, S) True = real token
        lang_hidden: jnp.ndarray,  # (B, T, l_dim)
        lang_valid: jnp.ndarray,  # (B, T) True = real label slot
        deterministic: bool = True,
    ):
        c = self.cfg
        f = c.fusion
        assert c.enc_layers % f.fusion_interval == 0, (
            f"ALIF scan needs enc_layers ({c.enc_layers}) divisible by "
            f"fusion_interval ({f.fusion_interval})"
        )
        n_blocks = c.enc_layers // f.fusion_interval
        refs = encoder_reference_points(spatial_shapes, valid_ratios, src.dtype)

        # static offset of the last feature level in the flattened axis
        sizes = [h * w for h, w in spatial_shapes]
        last_start = sum(sizes[:-1])

        import os

        Scan = nn.scan(
            ALIFBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast,) * 7,
            length=n_blocks,
            # see RobertaModel: RLIPV2_SCAN_UNROLL=1 unrolls for honest
            # flop counting in bench.py's MFU line
            unroll=(
                n_blocks
                if os.environ.get("RLIPV2_SCAN_UNROLL") == "1"
                else 1
            ),
        )
        (out, _), lang_states = Scan(
            c, self.text_cfg, self.dtype, name="blocks"
        )(
            (src, lang_hidden),
            pos,
            refs,
            spatial_shapes,
            valid_mask,
            lang_valid,
            last_start,
            deterministic,
        )
        # lang_states: (n_blocks, B, T, l_dim)

        if f.lang_aux_loss:
            if f.fusion_interval == 1:
                multi_lang = lang_states[::2]
            else:
                multi_lang = lang_states
        else:
            multi_lang = lang_states[-1]

        return out, multi_lang
