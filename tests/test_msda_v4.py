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


# decoder cross-attention shape: Q=200 is > the fused path's 128-query
# block but not a multiple of it — regression for the Qp/qb padding
# mismatch that crashed the train bench (reshape (BH, L, P, Qp//qb, qb))
DECODER_CASE = (((10, 12), (5, 6)), 1, 2, 8, 2, 200, 5, (-0.2, 1.2), False)


@pytest.mark.parametrize("variant", ["wide", "fused"])
@pytest.mark.parametrize("case", [CASES[0], CASES[2], CASES[3], DECODER_CASE])
def test_v4_backward_variants_match_per_point(case, variant):
    """The opt-in backward variants are bit-compatible with the default
    per-level per-point kernel across OOB / global-sampling cases:
    * fused: ALL levels in one pallas_call, one grid sweep (measured
      parity with per-level calls at the flagship shape — kept for A/B);
    * wide: one (P*qb)-lane axis, 3 large dots per window instead of 3*P
      small ones (measured slower; kept for A/B)."""
    from rlipv2_tpu.ops.ms_deform_attn_v4 import ms_deform_attn_v4_bwd

    shapes, B, H, D, P, Q, seed, loc_range, local = case
    value, loc, attn = make_inputs(shapes, B, H, D, P, Q, seed, loc_range, local)
    S = sum(h * w for h, w in shapes)
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(shapes, loc, attn)
    rng = np.random.RandomState(seed + 1)
    g = jnp.asarray(rng.randn(B * H, Q, D).astype(np.float32))
    kw = {"wide": True, "fused": False} if variant == "wide" else {"fused": True}
    with pltpu.force_tpu_interpret_mode():
        ref = ms_deform_attn_v4_bwd(
            iy, ix, wy0, wy1, wx0, wx1, v, g, spatial_shapes=shapes,
            fused=False,
        )
        out = ms_deform_attn_v4_bwd(
            iy, ix, wy0, wy1, wx0, wx1, v, g, spatial_shapes=shapes, **kw
        )
    for name, a, b in zip(["gy0", "gy1", "gx0", "gx1", "dv"], ref, out):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-5,
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
