"""The v3 windowed MSDA kernel (transposed layout + dynamic y-windows) vs
the XLA oracle: forward and the Pallas backward, across encoder/decoder
shapes, out-of-bounds and fully global sampling (interpret mode on CPU;
real-TPU timing lives in the bench drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rlipv2_tpu.ops.ms_deform_attn import (
    _ms_deform_attn_xla,
    _separable_prepare,
    ms_deform_attn,
)
from rlipv2_tpu.ops.ms_deform_attn_v3 import ms_deform_attn_transposed


def make_inputs(shapes, B, H, D, P, Q, seed, loc_range=(-0.2, 1.2), local=False):
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(seed)
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    if local and Q == S:
        refs = []
        for (h, w) in shapes:
            yy, xx = np.meshgrid(
                (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
            )
            refs.append(np.stack([xx, yy], -1).reshape(-1, 2))
        ref = np.concatenate(refs, 0)
        loc = jnp.asarray(
            ref[None, :, None, None, None, :]
            + rng.randn(B, Q, H, L, P, 2).astype(np.float32) * 0.02
        )
    else:
        loc = jnp.asarray(
            rng.uniform(*loc_range, (B, Q, H, L, P, 2)).astype(np.float32)
        )
    attn = jnp.asarray((rng.rand(B, Q, H, L, P) / (L * P)).astype(np.float32))
    return value, loc, attn


CASES = [
    # (shapes, B, H, D, P, Q, seed, loc_range, local)
    (((10, 12), (5, 6)), 1, 2, 8, 2, 150, 0, (-0.2, 1.2), False),  # Q==S global
    (((10, 12), (5, 6)), 1, 2, 8, 2, 150, 3, (0.0, 1.0), True),  # Q==S local
    (((10, 12), (5, 6)), 1, 2, 8, 2, 9, 1, (-0.2, 1.2), False),  # decoder
    (((9, 11),), 1, 1, 8, 3, 99, 4, (-0.5, 1.5), False),  # 1 lvl, wide OOB
]


@pytest.mark.parametrize("case", CASES)
def test_v3_forward_matches_xla(case):
    shapes, B, H, D, P, Q, seed, loc_range, local = case
    value, loc, attn = make_inputs(shapes, B, H, D, P, Q, seed, loc_range, local)
    ox = _ms_deform_attn_xla(value, shapes, loc, attn)
    S = sum(h * w for h, w in shapes)
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(shapes, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        out = ms_deform_attn_transposed(iy, ix, wy0, wy1, wx0, wx1, v, shapes)
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(B, Q, H * D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ox), atol=1e-4)


@pytest.mark.parametrize("case", [CASES[0], CASES[2]])
def test_v3_backward_matches_xla(case):
    shapes, B, H, D, P, Q, seed, loc_range, local = case
    value, loc, attn = make_inputs(shapes, B, H, D, P, Q, seed, loc_range, local)

    def fx(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="xla") ** 2)

    def fp(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="pallas") ** 2)

    gx = jax.grad(fx, argnums=(0, 1, 2))(value, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(fp, argnums=(0, 1, 2))(value, loc, attn)
    for name, a, b in zip(["dvalue", "dloc", "dattn"], gp, gx):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4,
            err_msg=name,
        )
