"""int8 dense projection — the quantized-matmul building block for the
dense stacks (Swin qkv/proj/MLP, deformable-encoder FFNs, BiMHA
projections).

Motivation (SURVEY §6, measured on a real v5e chip): the exact MSDA
kernel's ~35 img/s formulation ceiling and Swin-L's stage-3 matmuls at
64% MFU mean the remaining model-level speed levers are quantization and
resolution shaping, not more attention kernels. The MXU's nominal int8
rate is ~2x bf16 on v5e (393.7 vs 196.9 TOPS).

MEASURED VERDICT (round 5, real v5e chip — built, measured, rejected as
a speed default, mirroring the v5-tiling and fused-backward outcomes in
SURVEY §6): at the Swin-L stage-3 shape (37632x768 @ 768x3072) the
XLA int8 dot is only 1.13x the bf16 dot (0.557 vs 0.631 ms — the
compiler does not reach the 2x int8 MXU rate at these dims), and the
full dynamic-quant path (this module) measures 0.925 ms — SLOWER than
plain bf16, because the per-call quantize/rescale passes exceed the
~12% dot saving. A Pallas A/B (naive tiled matmul, same shape) shows
int8 1.44x over bf16 *within* the kernel but both far behind XLA's
scheduled matmul. Model level (BENCH r5): R50 int8-dense 29.9 vs 33.0
img/s; Swin-L int8-dense 13.4 vs 15.1. The path is therefore an
OPT-IN CAPABILITY, never a default; the bench legs remain as the
standing evidence.

Scheme (standard W8A8 dynamic quantization):
  * weights: symmetric per-OUTPUT-channel max-abs scales, quantized to
    int8 in-graph each call (one elementwise pass over (Cin, Cout) —
    negligible next to the (tokens, Cin, Cout) matmul);
  * activations: symmetric per-TOKEN (row-wise) dynamic max-abs scales —
    robust to the long activation tails LayerNorm'd transformer streams
    carry, no calibration pass needed;
  * dot: `lax.dot_general` on int8 operands with
    `preferred_element_type=int32` — XLA lowers this to the native int8
    MXU path; the (x_scale x w_scale) rescale + bias ride the fused
    epilogue.

`Int8Dense` keeps nn.Dense's EXACT param tree ("kernel" (Cin, Cout) +
"bias" (Cout,), fp32), so converted reference checkpoints
(engine/convert.py) load into the int8 model unchanged.

INFERENCE-ONLY opt-in (cfg flags `int8_dense`): `jnp.round` has a zero
gradient, so a training step through this module would silently drop the
weight gradients of every quantized layer. The eval/bench paths opt in;
the train step never does (guarded in tests/test_int8_dense.py).

Reference counterpart being beaten: fp torch projections in
models/swin/swin_transformer.py:126-186 and
models/deformable_transformer.py:927-941 (the reference has no
quantized path at all).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

default_kernel_init = nn.initializers.lecun_normal()


def quantize_symmetric(x: jnp.ndarray, axis, *, compute_dtype=jnp.float32):
    """Symmetric max-abs int8 quantization along `axis`.

    Returns (q_int8, scale) with x ~= q * scale; scale keeps the reduced
    axes as size-1 dims for broadcasting."""
    x = x.astype(compute_dtype)
    scale = jnp.max(jnp.abs(x), axis=axis, keepdims=True) / 127.0
    scale = jnp.maximum(scale, jnp.asarray(1e-12, compute_dtype))
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """x (..., Cin) @ kernel (Cin, Cout) via the int8 MXU path.

    Per-token activation scales, per-output-channel weight scales; the
    int32 accumulator is exact (127 * 127 * Cin << 2^31 for any Cin the
    models use), so the ONLY error is the two roundings."""
    xq, xs = quantize_symmetric(x, axis=-1)  # (..., Cin), (..., 1)
    wq, ws = quantize_symmetric(kernel, axis=0)  # (Cin, Cout), (1, Cout)
    acc = lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (..., Cout) int32
    return acc.astype(jnp.float32) * xs * ws[0]


class Int8Dense(nn.Module):
    """Drop-in nn.Dense with a W8A8 dynamically-quantized matmul.

    Same param tree and constructor surface as the nn.Dense call sites it
    replaces (features/use_bias/dtype/param_dtype/kernel_init/bias_init);
    `dtype` is the OUTPUT dtype (the rescale epilogue runs fp32)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        out = int8_matmul(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            out = out + bias.astype(jnp.float32)
        return out.astype(self.dtype)


def dense(features: int, *, int8: bool = False, **kwargs) -> nn.Module:
    """nn.Dense or its int8 twin, selected by the call site's config flag."""
    cls = Int8Dense if int8 else nn.Dense
    return cls(features, **kwargs)
