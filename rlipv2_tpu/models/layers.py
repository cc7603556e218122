"""Shared building-block layers (flax.linen).

Parity map:
  * MLP — reference models/dab_deformable/deformable_transformer.py:1759-1775
  * FeatureResizer — reference models/fuse_helper.py:54-73 (Linear 768→256 +
    LayerNorm(eps 1e-12) + dropout)
  * MultiBranchFusion — reference models/fuse_helper.py:755-798. TPU-first:
    the reference's `cardinality` ModuleLists of tiny Linears become three
    batched einsums over a (cardinality, in, sub) weight tensor — one MXU
    matmul each instead of 16 skinny GEMMs.
  * MSDeformAttention — reference models/ops/modules/ms_deform_attn.py:34-119
    (offset/weight projections + the grid-pattern bias init), dispatching to
    the fused XLA sampler in rlipv2_tpu/ops/ms_deform_attn.py instead of the
    CUDA extension.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from rlipv2_tpu.ops.int8_dense import dense
from rlipv2_tpu.ops.ms_deform_attn import ms_deform_attn


class MLP(nn.Module):
    """num_layers Dense stack with ReLU between (not after) layers."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class FeatureResizer(nn.Module):
    output_dim: int
    dropout: float = 0.1
    do_ln: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        if self.do_ln:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class MultiBranchFusion(nn.Module):
    """sum_k fc3_k(relu(fc1_k(a) * fc2_k(b))), then relu.

    Batched over cardinality with einsum so the MXU sees
    (.., in) x (card, in, sub) contractions.
    """

    representation_dim: int = 256
    cardinality: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        sub = self.representation_dim // self.cardinality
        assert sub * self.cardinality == self.representation_dim
        k = self.cardinality
        din_a, din_b = a.shape[-1], b.shape[-1]

        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (k, din_a, sub), self.dtype)
        b1 = self.param("b1", nn.initializers.zeros, (k, sub), self.dtype)
        w2 = self.param("w2", init, (k, din_b, sub), self.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (k, sub), self.dtype)
        w3 = self.param("w3", init, (k, sub, self.representation_dim), self.dtype)
        b3 = self.param("b3", nn.initializers.zeros, (k, self.representation_dim), self.dtype)

        ha = jnp.einsum("...c,kcs->...ks", a, w1) + b1
        hb = jnp.einsum("...c,kcs->...ks", b, w2) + b2
        h = nn.relu(ha * hb)  # (..., k, sub)
        out = jnp.einsum("...ks,ksr->...r", h, w3) + b3.sum(axis=0)
        return nn.relu(out)


def normalize_pixels(pixels: jnp.ndarray, dtype) -> jnp.ndarray:
    """uint8 (B, H, W, 3) -> ImageNet-normalized `dtype` ON DEVICE (XLA
    fuses the affine into the stem conv); float input is assumed already
    host-normalized (HOITransform(normalize=True)) and just cast. Keeping
    images uint8 through collate + transfer shrinks the host->device copy
    4x and saves ~3 full-image float passes on the host."""
    if pixels.dtype == jnp.uint8:
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        x = (pixels.astype(jnp.float32) * (1.0 / 255.0) - mean) / std
        return x.astype(dtype)
    return pixels.astype(dtype)


def sampling_offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reproduces the reference's radial grid init of sampling offsets
    (reference: models/ops/modules/ms_deform_attn.py:66-74)."""

    def init(key, shape, dtype=jnp.float32):
        thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
        grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)  # (H, 2)
        grid = grid / jnp.abs(grid).max(-1, keepdims=True)
        grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
        grid = grid * scale
        return grid.reshape(-1).astype(dtype)

    return init


class MSDeformAttention(nn.Module):
    """Multi-scale deformable attention layer (query-conditioned offsets +
    weights over a level-flattened value tensor)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32
    # auto | pallas | pallas_int8 | pallas_v3 | pallas_dense | xla;
    # pallas_int8 is the opt-in quantized inference fast path (<~1%
    # relative error, forward-only)
    impl: str = "auto"
    # W8A8 value/output projections (ops/int8_dense.py), eval-only; the
    # offsets/weights heads stay fp (zero-init kernels, precision-critical)
    int8_dense: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C); pos already added by caller
        reference_points: jnp.ndarray,  # (B, Q, L, 2) or (B, Q, L, 4), in [0,1]
        value_flatten: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[tuple[int, int]],  # static
        valid_mask: Optional[jnp.ndarray] = None,  # (B, S) True = real token
    ):
        B, Q, _ = query.shape
        S = value_flatten.shape[1]
        H, L, P = self.n_heads, self.n_levels, self.n_points
        head_dim = self.d_model // H

        value = dense(
            self.d_model, int8=self.int8_dense, dtype=self.dtype,
            name="value_proj",
        )(value_flatten)
        # optional remat-policy tag (cfg.remat_save_names A/B): saving the
        # value projection skips its recompute in the backward
        value = checkpoint_name(value, "msda_value")
        if valid_mask is not None:
            value = jnp.where(valid_mask[..., None], value, 0)
        value = value.reshape(B, S, H, head_dim)

        offsets = nn.Dense(
            H * L * P * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=sampling_offset_bias_init(H, L, P),
            name="sampling_offsets",
        )(query).reshape(B, Q, H, L, P, 2)
        attn = nn.Dense(
            H * L * P,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Q, H, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Q, H, L, P)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], dtype=offsets.dtype
            )  # (L, 2) as (W, H)
            locations = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        elif reference_points.shape[-1] == 4:
            locations = (
                reference_points[:, :, None, :, None, :2]
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )
        else:
            raise ValueError("reference_points last dim must be 2 or 4")

        out = ms_deform_attn(
            value, tuple(spatial_shapes), locations, attn, impl=self.impl
        )
        return dense(
            self.d_model, int8=self.int8_dense, dtype=self.dtype,
            name="output_proj",
        )(out)
