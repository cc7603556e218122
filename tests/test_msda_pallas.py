"""Separable Pallas kernel vs the XLA oracle, in interpret mode on CPU.
(The real-TPU validation lives in the bench/verify drive; this guards the
kernel math hermetically.)"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rlipv2_tpu.ops.ms_deform_attn import ms_deform_attn


def test_separable_kernel_matches_xla_interpret():
    shapes = ((6, 8), (3, 4))
    B, H, D, P = 1, 2, 8, 2
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    Q = 10
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, (B, Q, H, L, P, 2)).astype(np.float32))
    attn = jnp.asarray((rng.rand(B, Q, H, L, P) / (L * P)).astype(np.float32))

    ox = ms_deform_attn(value, shapes, loc, attn, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        op = ms_deform_attn(value, shapes, loc, attn, impl="pallas")
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox), atol=1e-4)


def test_pallas_grad_matches_xla():
    """The custom VJP (Pallas windowed backward kernel) must match
    autodiff of the XLA path."""
    shapes = ((5, 6), (3, 3))
    B, H, D, P = 1, 2, 4, 2
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    Q = 7
    rng = np.random.RandomState(1)
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0.1, 0.9, (B, Q, H, L, P, 2)).astype(np.float32))
    attn = jnp.asarray((rng.rand(B, Q, H, L, P) / (L * P)).astype(np.float32))

    def fx(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="xla") ** 2)

    def fp(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="pallas") ** 2)

    gx = jax.grad(fx, argnums=(0, 1, 2))(value, loc, attn)
    # the context must cover grad tracing: the backward is a Pallas
    # kernel too now (rlipv2_tpu/ops/ms_deform_attn_v3.py)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(fp, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
