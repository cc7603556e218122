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
        y = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
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
