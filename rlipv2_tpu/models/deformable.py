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

        ff = nn.Dense(c.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        ff = nn.Dropout(c.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(c.hidden_dim, dtype=self.dtype, name="linear2")(ff)
        src = src + nn.Dropout(c.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)


class DeformableEncoder(nn.Module):
    """Plain DDETR encoder (fusion_type == no_fusion path)."""

    cfg: TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, spatial_shapes, valid_ratios, pos, valid_mask, deterministic=True):
        refs = encoder_reference_points(spatial_shapes, valid_ratios, src.dtype)
        out = src
        for i in range(self.cfg.enc_layers):
            out = DeformableEncoderLayer(self.cfg, self.dtype, name=f"layer_{i}")(
                out, pos, refs, spatial_shapes, valid_mask, deterministic
            )
        return out


class ALIFEncoder(nn.Module):
    """Interleaved [VLFuse + RobertaLayer] / deformable-layer encoder."""

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
        refs = encoder_reference_points(spatial_shapes, valid_ratios, src.dtype)

        # static offset of the last feature level in the flattened axis
        sizes = [h * w for h, w in spatial_shapes]
        last_start = sum(sizes[:-1])

        out = src
        lang = lang_hidden
        lang_states = []
        fusion_idx = 0
        for idx in range(c.enc_layers):
            if idx % f.fusion_interval == 0:
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
                    name=f"vl_fuse_{fusion_idx}",
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

                # sparsified language path: ONE roberta layer per fusion,
                # with the reference's additive-bool mask quirk
                lang = RobertaLayer(
                    self.text_cfg, self.dtype, name=f"lang_layer_{fusion_idx}"
                )(lang, alif_additive_bool_mask(lang_valid, self.dtype), deterministic)
                lang_states.append(lang)
                fusion_idx += 1

            layer = DeformableEncoderLayer(c, self.dtype, name=f"layer_{idx}")
            if c.remat_encoder:
                out = nn.remat(
                    type(layer).__call__,
                    static_argnums=(4, 6),  # spatial_shapes, deterministic
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "msda_out"
                    ),
                )(layer, out, pos, refs, spatial_shapes, valid_mask,
                  deterministic)
            else:
                out = layer(
                    out, pos, refs, spatial_shapes, valid_mask, deterministic
                )

        if f.lang_aux_loss:
            if f.fusion_interval == 2:
                multi_lang = jnp.stack(lang_states, axis=0)  # (n_fusion, B, T, l_dim)
            elif f.fusion_interval == 1:
                multi_lang = jnp.stack(lang_states[::2], axis=0)
            else:
                multi_lang = jnp.stack(lang_states, axis=0)
        else:
            multi_lang = lang_states[-1]

        return out, multi_lang
