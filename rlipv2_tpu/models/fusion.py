"""ALIF cross-modal fusion: bi-directional multi-head attention + gated
residual blocks (the VLFuse step of RLIPv2's ALIF encoder).

Parity map:
  * BiMultiHeadAttention — reference models/fuse_helper.py:314-466. One QK^T
    computed once; its softmax over text gives vision→language attention and
    its (max-stabilized) transpose softmaxed over visual tokens gives
    language→vision attention. embed_dim 2048, 8 heads, v_dim 256,
    l_dim 768; vision positional embeds added to Q; fp16-era ±50000 clamps
    kept as config flags (harmless in bf16/f32).
  * BiAttentionBlock — reference models/fuse_helper.py:591-752: pre-LN on
    both modalities, then a residual *on the normed features* (faithful to
    the reference, which reassigns `v = layer_norm(v)` before the residual),
    with one of 14 gating mechanisms (reference gating table at :690-750;
    the shipped RLIPv2-ParSeDA config uses `VXAc`).

TPU-first notes: everything is batched einsum on (B, heads, N, M) — the
two directions share the logits tensor so XLA materializes QK^T once; masks
are additive; no in-place ops.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlipv2_tpu.config import FusionConfig
from rlipv2_tpu.models.layers import MultiBranchFusion
from rlipv2_tpu.ops.int8_dense import dense

MASK_NEG = -9e15


class BiMultiHeadAttention(nn.Module):
    v_dim: int = 256
    l_dim: int = 768
    embed_dim: int = 2048
    num_heads: int = 8
    dropout: float = 0.1
    stable_softmax_2d: bool = False
    clamp_min_for_underflow: bool = True
    clamp_max_for_overflow: bool = True
    dtype: jnp.dtype = jnp.float32
    # W8A8 projections (ops/int8_dense.py), eval-only; the 2048-wide
    # value/out projections over ~1e5 visual tokens are MXU-bound
    int8_dense: bool = False

    @nn.compact
    def __call__(
        self,
        v: jnp.ndarray,  # (B, Nv, v_dim)
        l: jnp.ndarray,  # (B, Nl, l_dim)
        v_pos: Optional[jnp.ndarray] = None,  # (B, Nv, v_dim)
        mask_l: Optional[jnp.ndarray] = None,  # (B, Nl) 1 = valid
        mask_v: Optional[jnp.ndarray] = None,  # (B, Nv) 1 = valid
        deterministic: bool = True,
    ):
        B, Nv, _ = v.shape
        Nl = l.shape[1]
        H = self.num_heads
        hd = self.embed_dim // H
        scale = hd ** -0.5

        q_in = v if v_pos is None else v + v_pos
        i8 = self.int8_dense
        q = dense(self.embed_dim, int8=i8, dtype=self.dtype, name="v_proj")(q_in) * scale
        k = dense(self.embed_dim, int8=i8, dtype=self.dtype, name="l_proj")(l)
        val_v = dense(self.embed_dim, int8=i8, dtype=self.dtype, name="values_v_proj")(v)
        val_l = dense(self.embed_dim, int8=i8, dtype=self.dtype, name="values_l_proj")(l)

        def heads(x, n):
            return x.reshape(B, n, H, hd)

        logits = jnp.einsum("bvhd,blhd->bhvl", heads(q, Nv), heads(k, Nl))

        if self.stable_softmax_2d:
            logits = logits - jax.lax.stop_gradient(logits.max())
        if self.clamp_min_for_underflow:
            logits = jnp.maximum(logits, -50000.0)
        if self.clamp_max_for_overflow:
            logits = jnp.minimum(logits, 50000.0)

        # language -> vision: softmax over visual tokens on the transpose
        logits_t = jnp.swapaxes(logits, 2, 3)  # (B, H, Nl, Nv)
        logits_t = logits_t - jax.lax.stop_gradient(
            logits_t.max(axis=-1, keepdims=True)
        )
        if self.clamp_min_for_underflow:
            logits_t = jnp.maximum(logits_t, -50000.0)
        if self.clamp_max_for_overflow:
            logits_t = jnp.minimum(logits_t, 50000.0)
        # Reference-faithful quirk: fuse_helper.py:406-415/430-438 does
        # `bool_mask.masked_fill(bool_mask == 0, -9e15)` — filling a BOOL
        # tensor casts -9e15 to True, so the mask ends up all-True and adds
        # a CONSTANT 1.0 per softmax row: an exact no-op. Both BiMHA
        # attention masks are therefore dead in the reference (the ALIF
        # caller always passes bool masks), and replicating that is what
        # makes the converted encoder output-exact (tests/test_alif_parity).
        # mask_v / mask_l stay in the signature for API stability.
        del mask_v, mask_l
        attn_l = nn.softmax(logits_t, axis=-1)

        # vision -> language: softmax over text tokens
        attn_v = nn.softmax(logits, axis=-1)

        attn_v = nn.Dropout(self.dropout)(attn_v, deterministic=deterministic)
        attn_l = nn.Dropout(self.dropout)(attn_l, deterministic=deterministic)

        out_v = jnp.einsum("bhvl,blhd->bvhd", attn_v, heads(val_l, Nl)).reshape(
            B, Nv, self.embed_dim
        )
        out_l = jnp.einsum("bhlv,bvhd->blhd", attn_l, heads(val_v, Nv)).reshape(
            B, Nl, self.embed_dim
        )
        out_v = dense(self.v_dim, int8=i8, dtype=self.dtype, name="out_v_proj")(out_v)
        out_l = dense(self.l_dim, int8=i8, dtype=self.dtype, name="out_l_proj")(out_l)
        return out_v, out_l


class BiAttentionBlock(nn.Module):
    """Pre-LN bi-attention with configurable gated residual."""

    cfg: FusionConfig
    v_dim: int = 256
    l_dim: int = 768
    num_feature_levels: int = 4
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False  # threaded into BiMHA (eval-only W8A8)

    @nn.compact
    def __call__(self, v, l, v_pos=None, mask_l=None, mask_v=None, deterministic=True):
        c = self.cfg
        init_values = 1.0 / self.num_feature_levels

        v = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_v")(v)
        l = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm_l")(l)
        delta_v, delta_l = BiMultiHeadAttention(
            v_dim=self.v_dim,
            l_dim=self.l_dim,
            embed_dim=c.embed_dim,
            num_heads=c.num_heads,
            stable_softmax_2d=c.stable_softmax_2d,
            clamp_min_for_underflow=c.clamp_min_for_underflow,
            clamp_max_for_overflow=c.clamp_max_for_overflow,
            dtype=self.dtype,
            int8_dense=self.int8_dense,
            name="attn",
        )(v, l, v_pos, mask_l, mask_v, deterministic)

        mode = c.gating_mechanism
        gamma_init = nn.initializers.constant(init_values)
        # gamma params exist for every mode (matches the reference module,
        # which always allocates them)
        gamma_v = self.param("gamma_v", gamma_init, (self.v_dim,), jnp.float32)
        gamma_l = self.param("gamma_l", gamma_init, (self.l_dim,), jnp.float32)

        def gate_self(x_dim, gamma, delta, prefix, ln=False, to_one=False):
            down_dim = x_dim // 2 if to_one else x_dim // 4
            h = nn.Dense(down_dim, dtype=self.dtype, name=f"{prefix}_down")(delta)
            if ln:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{prefix}_ln")(h)
            h = nn.relu(h)
            out_dim = 1 if to_one else x_dim
            return nn.Dense(out_dim, dtype=self.dtype, name=f"{prefix}_up")(h)

        if mode == "GLIP":
            gv, gl = gamma_v, gamma_l
        elif mode == "Vtanh":
            gv, gl = jnp.tanh(gamma_v[0]), jnp.tanh(gamma_l[0])
        elif mode == "Etanh":
            gv, gl = jnp.tanh(gamma_v), jnp.tanh(gamma_l)
        elif mode == "Stanh":
            gv = jnp.tanh(gate_self(self.v_dim, gamma_v, gamma_v, "gate_v"))
            gl = jnp.tanh(gate_self(self.l_dim, gamma_l, gamma_l, "gate_l"))
        elif mode == "SDFtanh":
            gv = jnp.tanh(gate_self(self.v_dim, gamma_v, delta_v, "gate_v"))
            gl = jnp.tanh(gate_self(self.l_dim, gamma_l, delta_l, "gate_l"))
        elif mode == "SFtanh":
            gv = jnp.tanh(gate_self(self.v_dim, gamma_v, v, "gate_v"))
            gl = jnp.tanh(gate_self(self.l_dim, gamma_l, l, "gate_l"))
        elif mode == "SOtanh":
            gv = jnp.tanh(gate_self(self.v_dim, gamma_v, gamma_v, "gate_v", to_one=True))
            gl = jnp.tanh(gate_self(self.l_dim, gamma_l, gamma_l, "gate_l", to_one=True))
        elif mode == "VXAc":
            gv, gl = gamma_v[0], gamma_l[0]
        elif mode == "SXAc":
            gv = gate_self(self.v_dim, gamma_v, gamma_v, "gate_v")
            gl = gate_self(self.l_dim, gamma_l, gamma_l, "gate_l")
        elif mode == "SDFXAc":
            gv = gate_self(self.v_dim, gamma_v, delta_v, "gate_v")
            gl = gate_self(self.l_dim, gamma_l, delta_l, "gate_l")
        elif mode == "SXAcLN":
            gv = gate_self(self.v_dim, gamma_v, gamma_v, "gate_v", ln=True)
            gl = gate_self(self.l_dim, gamma_l, gamma_l, "gate_l", ln=True)
        elif mode == "SDFXAcLN":
            gv = gate_self(self.v_dim, gamma_v, delta_v, "gate_v", ln=True)
            gl = gate_self(self.l_dim, gamma_l, delta_l, "gate_l", ln=True)
        elif mode == "SDFOXAcLN":
            gv = gate_self(self.v_dim, gamma_v, delta_v, "gate_v", ln=True, to_one=True)
            gl = gate_self(self.l_dim, gamma_l, delta_l, "gate_l", ln=True, to_one=True)
        elif mode == "MBF":
            v = MultiBranchFusion(self.v_dim, 16, dtype=self.dtype, name="mbf_v")(v, delta_v)
            l = MultiBranchFusion(self.l_dim, 16, dtype=self.dtype, name="mbf_l")(l, delta_l)
            return v, l
        elif mode == "XGating":
            gv, gl = 1.0, 1.0
        else:
            raise ValueError(f"unknown gating mechanism: {mode}")

        v = v + gv * delta_v
        l = l + gl * delta_l
        return v, l
