"""ResNet backbone (flax.linen, NHWC) with frozen BatchNorm folded to a
per-channel affine.

Capability parity with the reference's DDETR-style multi-level ResNet
(reference: models/DDETR_backbone.py — torchvision resnet50/101 +
FrozenBatchNorm2d + IntermediateLayerGetter over layer2..4, strides
8/16/32, channels 512/1024/2048).

TPU-first notes: NHWC layout (XLA TPU's native conv layout); FrozenBN is
algebraically folded to `y = x * scale + bias` (scale = gamma/sqrt(var+eps),
bias = beta - mean*scale), computed once at weight-conversion time — the
reference evaluates the 4-buffer form every forward. The fold fuses into
the preceding conv via XLA. Stem + stage 1 are excluded from the optimizer
via a path mask (mirroring DETR's requires_grad freezing), not by stopping
gradients here.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class FrozenAffine(nn.Module):
    """Folded frozen BatchNorm: per-channel scale & bias, excluded from the
    optimizer by the 'frozen_affine' name filter in parallel/optim."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


class _StemConvS2D(nn.Module):
    """The 7x7/stride-2 RGB stem conv via space-to-depth.

    A direct 7x7 conv over 3 input channels runs at ~11 TFLOP/s on the MXU
    (K = 147 with a 3-channel inner dim starves the systolic array;
    measured 7.6 ms of the 22.5 ms R50 forward at 832x1344 bs8). Packing
    2x2 pixel blocks into 12 channels turns it into the EXACTLY equivalent
    4x4/stride-1 conv with K = 192 and asymmetric (2,1) padding — the
    canonical TPU stem transformation. The parameter keeps the reference
    (7, 7, 3, 64) HWIO shape AND the `conv1/kernel` tree path so
    checkpoint conversion is unchanged; the weight is re-laid out at
    trace time (147*64 elements, negligible).

    Derivation: output(i,j) sums w7[ky,kx,c] * x[2i-3+ky, 2j-3+kx, c];
    writing ky-3 = 2u+di (u in -2..1, di in {0,1}) maps each tap onto
    packed row i+u and packed channel (di*2+dj)*3+c.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax.lax as lax

        w7 = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, 64),
            jnp.float32,
        )
        # trace-time weight re-layout (7,7,3,64) -> (4,4,12,64)
        w4 = jnp.zeros((4, 4, 12, 64), w7.dtype)
        for ky in range(7):
            u, di = (ky - 3) // 2, (ky - 3) % 2
            for kx in range(7):
                v, dj = (kx - 3) // 2, (kx - 3) % 2
                ch = (di * 2 + dj) * 3
                w4 = w4.at[u + 2, v + 2, ch : ch + 3].set(w7[ky, kx])
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            H, W = x.shape[1], x.shape[2]
        # space-to-depth: channel index (di*2+dj)*3 + c
        xp = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(
            B, H // 2, W // 2, 4 * C
        )
        return lax.conv_general_dilated(
            xp.astype(self.dtype),
            w4.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output = 4 * features
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenAffine(self.features, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenAffine(self.features, self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenAffine(self.features * 4, self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = FrozenAffine(self.features * 4, self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


STAGE_BLOCKS = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    # 1-block-per-stage variant for fast tests / dryruns (same structure)
    "resnet_test": (1, 1, 1, 1),
}


class ResNet(nn.Module):
    """Returns the last `num_outputs` stage outputs (strides ... 8, 16, 32)."""

    name_variant: str = "resnet50"
    num_outputs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.name_variant]
        y = _StemConvS2D(self.dtype, name="conv1")(x)
        y = FrozenAffine(64, self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outputs = []
        features = 64
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                y = Bottleneck(
                    features,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(y)
            outputs.append(y)
            features *= 2
        return outputs[-self.num_outputs :]


BACKBONE_CHANNELS = {
    "resnet50": (512, 1024, 2048),
    "resnet_test": (512, 1024, 2048),
    "resnet101": (512, 1024, 2048),
    "swin_tiny": (192, 384, 768),
    "swin_small": (192, 384, 768),
    "swin_base": (256, 512, 1024),
    "swin_base_384": (256, 512, 1024),
    "swin_large": (384, 768, 1536),
    "swin_large_384": (384, 768, 1536),
    "swin_test": (64, 128, 256),
}
