"""Fused Pallas window attention vs the XLA einsum chain (interpret mode
on CPU): plain + shifted-mask variants, N=49 unpadded tokens, odd group
sizes, gradients, and the WindowAttention module path equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rlipv2_tpu.ops.window_attention import (
    _attn_reference,
    fused_window_attention,
)


def make(nW=6, B=2, N=49, h=3, d=32, seed=0):
    rng = np.random.RandomState(seed)
    nWB = nW * B
    C = h * d
    qkv = jnp.asarray(rng.randn(nWB, N, 3 * C), jnp.float32)
    bias = jnp.asarray(rng.randn(h, N, N).astype(np.float32))
    mask = jnp.asarray(rng.randn(nW, N, N).astype(np.float32))
    return qkv, bias, mask


def test_fused_matches_reference():
    qkv, bias, _ = make()
    with pltpu.force_tpu_interpret_mode():
        out = fused_window_attention(qkv, bias, None, 3, 4)
        ref = _attn_reference(qkv, bias, None, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_masked_matches_reference():
    qkv, bias, mask = make()
    with pltpu.force_tpu_interpret_mode():
        out = fused_window_attention(qkv, bias, mask, 3, 3)
        ref = _attn_reference(qkv, bias, mask, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_group_reduction_when_not_divisible():
    # nW = 3 with group 8 -> internally reduced to 1
    qkv, bias, mask = make(nW=3, B=4)
    with pltpu.force_tpu_interpret_mode():
        out = fused_window_attention(qkv, bias, mask, 3, 8)
        ref = _attn_reference(qkv, bias, mask, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_xla():
    qkv, bias, mask = make(nW=2, B=2, h=2)

    def f_fused(a):
        return jnp.sum(fused_window_attention(a, bias, mask, 2, 2) ** 2)

    def f_ref(a):
        return jnp.sum(_attn_reference(a, bias, mask, 2) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_fused)(qkv)
        g2 = jax.grad(f_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
