"""The v4 MSDA kernel (scalar-prefetched window plans + dynamic fori_loop
window sweep) vs the XLA oracle: forward and Pallas backward, including
out-of-bounds and fully global sampling (interpret mode on CPU; real-TPU
timing lives in the bench drive)."""

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
from rlipv2_tpu.ops.ms_deform_attn_v4 import ms_deform_attn_v4

from tests.test_msda_v3 import CASES, make_inputs


@pytest.mark.parametrize("case", CASES)
def test_v4_forward_matches_xla(case):
    shapes, B, H, D, P, Q, seed, loc_range, local = case
    value, loc, attn = make_inputs(shapes, B, H, D, P, Q, seed, loc_range, local)
    ox = _ms_deform_attn_xla(value, shapes, loc, attn)
    S = sum(h * w for h, w in shapes)
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(shapes, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        out = ms_deform_attn_v4(iy, ix, wy0, wy1, wx0, wx1, v, shapes)
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(B, Q, H * D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ox), atol=1e-4)


@pytest.mark.parametrize("case", [CASES[0], CASES[2], CASES[3]])
def test_v4_backward_matches_xla(case):
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


@pytest.mark.parametrize("case", [CASES[0], CASES[1]])
def test_v4_int8_close_to_oracle(case):
    """The opt-in int8 fast path stays within ~1% relative error of the
    exact oracle (per-(bh,level) value scales + x127 mixer scale)."""
    shapes, B, H, D, P, Q, seed, loc_range, local = case
    value, loc, attn = make_inputs(shapes, B, H, D, P, Q, seed, loc_range, local)
    ox = _ms_deform_attn_xla(value, shapes, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        oi = ms_deform_attn(value, shapes, loc, attn, impl="pallas_int8")
    scale = max(float(jnp.abs(ox).max()), 1e-6)
    err = float(jnp.max(jnp.abs(oi - ox))) / scale
    assert err < 0.02, err
