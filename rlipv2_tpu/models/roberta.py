"""RoBERTa text encoder (flax.linen), weight-convertible from HF PyTorch.

Capability parity:
  * full `RobertaModel` used to pool per-label text features
    (reference: models/dab_deformable/deformable_transformer.py:334-337,
    497-522 — tokenizer + encoder + `pooler_output` per label text);
  * standalone `RobertaLayer` run on the ALIF language path
    (reference: models/modeling_roberta.py:340, used at
    models/deformable_transformer.py:866-869).

ALIF language mask: the reference's standalone RobertaLayer
(models/modeling_roberta.py:376-381) runs the incoming bool mask through
HF's `get_extended_attention_mask`, i.e. proper (1-mask)*finfo.min
additive masking — the same convention as the main text encoder.
`alif_additive_bool_mask` builds that extended mask; output-exactness vs
the vendored layer is locked by tests/test_alif_parity.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from rlipv2_tpu.config import TextEncoderConfig

NEG_INF = -1e9


def extended_attention_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) bool/0-1 validity -> (B, 1, 1, T) additive mask (0 / -inf)."""
    m = mask.astype(dtype)
    return ((1.0 - m) * NEG_INF)[:, None, None, :]


def alif_additive_bool_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) bool validity -> (B, 1, 1, T) HF extended additive mask:
    0 on valid slots, finfo(dtype).min on pads. The reference's standalone
    RobertaLayer (models/modeling_roberta.py:376-381) runs the bool mask
    through `get_extended_attention_mask`, i.e. PROPER -inf masking —
    verified output-exact by tests/test_alif_parity.py. (A raw
    bool-additive interpretation was round-1's reading; the vendored layer
    actually extends the mask.)

    The constant must be finfo(COMPUTE dtype).min, like HF: float32's min
    cast to bfloat16 overflows to -inf and then VALID slots compute
    (1-1) * -inf = NaN — every bf16 forward NaN'd through the ALIF
    language path before this used the dtype's own min."""
    m = mask.astype(dtype)[:, None, None, :]
    fdtype = dtype if jnp.issubdtype(jnp.dtype(dtype), jnp.floating) else jnp.float32
    return (1.0 - m) * jnp.asarray(jnp.finfo(fdtype).min, dtype)


def create_position_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa-style position ids: pad positions keep padding_idx; real
    tokens count up from padding_idx + 1."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + pad_token_id


class RobertaSelfAttention(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, attn_mask, deterministic=True):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        B, T, _ = hidden.shape

        def heads(x):
            return x.reshape(B, T, c.num_heads, head_dim)

        q = heads(nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(hidden))
        k = heads(nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(hidden))
        v = heads(nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(hidden))

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(self.dtype)
        if attn_mask is not None:
            scores = scores + attn_mask
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(0.1)(probs, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, c.hidden_size)
        return ctx


class RobertaLayer(nn.Module):
    """One transformer encoder layer with HF post-LN structure.

    scan_mode=True returns the (carry, ys) pair nn.scan expects so the
    12-layer stack traces ONCE (stacked params on a leading layer axis)
    instead of unrolling 12 copies into the HLO — the single biggest
    compile-time lever in the flagship graph (VERDICT r3 next #1b)."""

    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    scan_mode: bool = False

    @nn.compact
    def __call__(self, hidden, attn_mask=None, deterministic=True):
        c = self.cfg
        attn_out = RobertaSelfAttention(c, self.dtype, name="attention_self")(
            hidden, attn_mask, deterministic
        )
        attn_out = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output_dense")(attn_out)
        attn_out = nn.Dropout(0.1)(attn_out, deterministic=deterministic)
        hidden = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=self.dtype, name="attention_output_ln"
        )(hidden + attn_out)

        inter = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(hidden)
        inter = nn.gelu(inter, approximate=False)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output_dense")(inter)
        out = nn.Dropout(0.1)(out, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="output_ln")(
            hidden + out
        )
        if self.scan_mode:
            return hidden, None
        return hidden


class RobertaEmbeddings(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic=True):
        c = self.cfg
        position_ids = create_position_ids(input_ids, c.pad_token_id)
        we = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype, name="word_embeddings")(
            input_ids
        )
        pe = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=self.dtype, name="position_embeddings"
        )(position_ids)
        te = nn.Embed(
            c.type_vocab_size, c.hidden_size, dtype=self.dtype, name="token_type_embeddings"
        )(jnp.zeros_like(input_ids))
        h = we + pe + te
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln")(h)
        return nn.Dropout(0.1)(h, deterministic=deterministic)


class RobertaModel(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    add_pooler: bool = True

    @nn.compact
    def __call__(self, input_ids, attention_mask, deterministic=True):
        """input_ids (B, T) int32, attention_mask (B, T) 1=real.
        Returns (last_hidden_state, pooler_output)."""
        c = self.cfg
        h = RobertaEmbeddings(c, self.dtype, name="embeddings")(input_ids, deterministic)
        ext = extended_attention_mask(attention_mask, self.dtype)
        # lax.scan over the identical layers: params stacked on a leading
        # (num_layers, ...) axis under "layers" (converter:
        # engine/convert.py stack_layer_params), ONE traced layer body
        import os

        ScanStack = nn.scan(
            RobertaLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=c.num_layers,
            # RLIPV2_SCAN_UNROLL=1 (trace-time knob): emit the unrolled
            # body so XLA cost analysis counts every layer (bench.py MFU);
            # default stays the rolled loop for compile speed
            unroll=(
                c.num_layers
                if os.environ.get("RLIPV2_SCAN_UNROLL") == "1"
                else 1
            ),
        )
        h, _ = ScanStack(c, self.dtype, scan_mode=True, name="layers")(
            h, ext, deterministic
        )
        pooled = None
        if self.add_pooler:
            pooled = nn.Dense(c.hidden_size, dtype=self.dtype, name="pooler_dense")(h[:, 0])
            pooled = jnp.tanh(pooled)
        return h, pooled
