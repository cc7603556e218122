"""Swin Transformer backbone (flax.linen, NHWC).

Capability parity with the reference's Swin
(models/swin/swin_transformer.py, 763 LoC; variant configs at
models/swin/backbone.py:105-163): T/S/B/L (+384) variants, 4x4 patch
embedding, window attention with relative position bias, shifted windows
with the static attention mask, patch merging, per-block stochastic
drop-path, out_indices = stages 1..3 (strides 8/16/32), optional remat
(`--use_checkpoint`).

TPU-first notes:
  * NHWC layout; window partitioning is pure reshape/transpose on padded
    (multiple-of-window) grids — all static shapes;
  * the shifted-window attention mask is computed at trace time from
    static (H, W) and folded into the logits as an additive bias;
  * drop-path is implemented per sample (batch-dim bernoulli), disabled
    when deterministic;
  * remat wraps whole blocks, mirroring torch.utils.checkpoint usage.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.ops.int8_dense import dense


@dataclasses.dataclass(frozen=True)
class SwinSpec:
    embed_dim: int
    depths: tuple
    num_heads: tuple
    window_size: int = 7
    pretrain_img_size: int = 224


SWIN_SPECS = {
    "swin_tiny": SwinSpec(96, (2, 2, 6, 2), (3, 6, 12, 24), 7),
    "swin_small": SwinSpec(96, (2, 2, 18, 2), (3, 6, 12, 24), 7),
    "swin_base": SwinSpec(128, (2, 2, 18, 2), (4, 8, 16, 32), 7),
    "swin_base_384": SwinSpec(128, (2, 2, 18, 2), (4, 8, 16, 32), 12, 384),
    "swin_large": SwinSpec(192, (2, 2, 18, 2), (6, 12, 24, 48), 7),
    "swin_large_384": SwinSpec(192, (2, 2, 18, 2), (6, 12, 24, 48), 12, 384),
    # tiny test variant
    "swin_test": SwinSpec(32, (1, 1, 1, 1), (2, 2, 4, 4), 4),
}


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nH*nW, ws, ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, C)


def window_reverse(wins, ws, H, W):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws^2, ws^2) indices into the (2ws-1)^2 bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0) + np.array([ws - 1, ws - 1])
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, ws^2, ws^2) for shifted windows."""
    img_mask = np.zeros((H, W), np.int32)
    cnt = 0
    for h_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w_sl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[h_sl, w_sl] = cnt
            cnt += 1
    m = img_mask.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    diff = m[:, None, :] != m[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False  # W8A8 qkv/proj (ops/int8_dense.py), eval-only

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        """x: (nW*B, N, C); mask: (nW, N, N) additive or None."""
        Bn, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv_flat = dense(
            3 * C, int8=self.int8_dense, dtype=self.dtype, name="qkv"
        )(x)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
            jnp.float32,
        )
        idx = relative_position_index(self.window_size)
        bias = table[idx.reshape(-1)].reshape(N, N, h)
        bias = jnp.transpose(bias, (2, 0, 1)).astype(self.dtype)  # (h, N, N)

        import os

        if (
            jax.default_backend() == "tpu"
            and hd % 8 == 0
            and os.environ.get("RLIPV2_SWIN_FUSED", "1") != "0"
        ):
            # RLIPV2_SWIN_FUSED=0 forces the plain-XLA path below even on
            # TPU — the A/B knob tools/profile_swin.py uses (read at trace
            # time)
            # fused Pallas path (ops/window_attention.py): consumes the
            # packed (nWB, N, 3C) projection directly (no relayouts) and
            # runs QK -> bias/mask -> softmax -> AV in VMEM
            from rlipv2_tpu.ops.window_attention import (
                fused_window_attention,
            )

            group = 8 if h <= 12 else 2
            out = fused_window_attention(
                qkv_flat,
                bias.astype(jnp.float32),
                None if mask is None else mask.astype(jnp.float32),
                h,
                group,
            ).astype(self.dtype)
            return dense(
                C, int8=self.int8_dense, dtype=self.dtype, name="proj"
            )(out)

        qkv = qkv_flat.reshape(Bn, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd**-0.5)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) + mask[None, :, None].astype(
                self.dtype
            )
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, N, C)
        return dense(
            C, int8=self.int8_dense, dtype=self.dtype, name="proj"
        )(out)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return x / keep * mask


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False  # W8A8 qkv/proj/MLP matmuls, eval-only

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: (B, H, W, C), H/W already padded to window multiples."""
        B, H, W, C = x.shape
        ws = self.window_size
        shift = self.shift if min(H, W) > ws else 0

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(H, W, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws).reshape(-1, ws * ws, C)
        wins = WindowAttention(
            self.dim, self.num_heads, ws, self.dtype,
            int8_dense=self.int8_dense, name="attn",
        )(wins, mask, deterministic)
        y = window_reverse(wins.reshape(-1, ws, ws, C), ws, H, W)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(y, deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = dense(
            int(C * self.mlp_ratio), int8=self.int8_dense,
            dtype=self.dtype, name="mlp_fc1",
        )(y)
        y = nn.gelu(y, approximate=False)
        y = dense(C, int8=self.int8_dense, dtype=self.dtype, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # pad to even
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        H2, W2 = x.shape[1] // 2, x.shape[2] // 2
        x = x.reshape(B, H2, 2, W2, 2, C)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H2, W2, 4 * C)
        # torch concat order: (x0, x1, x2, x3) = rows (0::2, 1::2) x cols —
        # our reshape gives [r0c0, r0c1, r1c0, r1c1]; torch gives
        # [r0c0, r1c0, r0c1, r1c1]; the converter permutes the kernel.
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    spec: SwinSpec
    out_indices: Sequence[int] = (1, 2, 3)
    drop_path_rate: float = 0.0
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    int8_dense: bool = False  # W8A8 qkv/proj/MLP matmuls, eval-only

    @classmethod
    def from_name(cls, name: str, drop_path_rate: float = 0.0, dtype=jnp.float32,
                  use_checkpoint: bool = False, int8_dense: bool = False):
        return cls(
            SWIN_SPECS[name],
            drop_path_rate=drop_path_rate,
            dtype=dtype,
            use_checkpoint=use_checkpoint,
            int8_dense=int8_dense,
        )

    @nn.compact
    def __call__(self, x, deterministic=True):
        spec = self.spec
        ws = spec.window_size
        # 4x4 patch embed
        x = nn.Conv(
            spec.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype, name="patch_embed"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        total_blocks = sum(spec.depths)
        dpr = np.linspace(0, self.drop_path_rate, total_blocks)

        outs = []
        block_i = 0
        for stage, depth in enumerate(spec.depths):
            dim = spec.embed_dim * (2**stage)
            # pad to window multiples (static)
            B, H, W, C = x.shape
            ph, pw = (-H) % ws, (-W) % ws
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            for d in range(depth):
                blk = SwinBlock(
                    dim,
                    spec.num_heads[stage],
                    ws,
                    shift=0 if d % 2 == 0 else ws // 2,
                    drop_path=float(dpr[block_i]),
                    dtype=self.dtype,
                    int8_dense=self.int8_dense,
                    name=f"stage{stage}_block{d}",
                )
                if self.use_checkpoint:
                    xp = nn.remat(SwinBlock.__call__)(blk, xp, deterministic)
                else:
                    xp = blk(xp, deterministic)
                block_i += 1
            x = xp[:, :H, :W]
            if stage in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"out_norm{stage}")(x)
                outs.append(out)
            if stage < len(spec.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{stage}")(x)
        return outs
