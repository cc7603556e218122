"""The v5 MSDA kernel (sub-slab level splitting + column-strip query
permutation + dead-sub-slab skipping) vs the XLA oracle, including levels
wider than one 128-lane slab, global/OOB sampling, decoder-style queries
(no permutation), and the grad path through the shared VJP (v5 forward +
v4 backward). Interpret mode on CPU; real-TPU timing lives in
tools/profile_msda_ab.py."""

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
from rlipv2_tpu.ops.ms_deform_attn_v5 import (
    _grid_perm,
    _n_sub,
    ms_deform_attn_v5,
)

from tests.test_msda_v3 import CASES, make_inputs

# wide-level cases: W > 128 forces the sub-slab split (2 slabs at
# W=168, like the flagship level 0 at 1344 px) — the narrow CASES keep
# covering the 1-slab path
WIDE_CASES = [
    # (shapes, B, H, D, P, Q, seed, loc_range, local)
    (((6, 168), (3, 84)), 1, 2, 8, 2, 1260, 0, (0.0, 1.0), True),
    (((6, 168), (3, 84)), 1, 2, 8, 2, 1260, 1, (-0.3, 1.3), False),
    (((12, 168),), 1, 1, 8, 3, 17, 2, (-0.5, 1.5), False),  # decoder-ish
    (((16, 260),), 1, 1, 8, 2, 4160, 3, (0.0, 1.0), True),  # 3 slabs
    # w = 255 ≡ 1 (mod 127): ix = w-1 must be owned by the last slab
    # (regression: ceil((w-1)/127) under-covered it and zeroed the
    # right-edge sample; biased loc_range forces right-edge sampling)
    (((4, 255),), 1, 1, 8, 2, 1020, 4, (0.9, 1.05), False),
]


def _run_v5(shapes, value, loc, attn, **kw):
    B, S, H, D = value.shape
    Q = loc.shape[1]
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(shapes, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        out = ms_deform_attn_v5(iy, ix, wy0, wy1, wx0, wx1, v, shapes, **kw)
    return jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(
        B, Q, H * D
    )


@pytest.mark.parametrize("case", list(CASES) + WIDE_CASES)
def test_v5_forward_matches_xla(case):
    shapes, B, H, D, P, Q, seed, loc_range, local = case
    value, loc, attn = make_inputs(shapes, B, H, D, P, Q, seed, loc_range, local)
    ox = _ms_deform_attn_xla(value, shapes, loc, attn)
    out = _run_v5(shapes, value, loc, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ox), atol=1e-4)


def test_v5_small_query_block_strips():
    """qb smaller than a strip exercises strip padding + dead halves."""
    shapes = ((6, 168),)
    value, loc, attn = make_inputs(shapes, 1, 1, 8, 2, 1008, 5, (0.0, 1.0), True)
    ox = _ms_deform_attn_xla(value, shapes, loc, attn)
    out = _run_v5(shapes, value, loc, attn, query_block=64, strip_w=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ox), atol=1e-4)


def test_grid_perm_is_a_permutation():
    shapes = ((6, 168), (3, 84))
    pg = _grid_perm(shapes, 64, 32)
    assert pg is not None
    perm, inv = pg
    Q = sum(h * w for h, w in shapes)
    real = perm[perm < Q]
    assert sorted(real.tolist()) == list(range(Q))
    assert len(perm) % 64 == 0
    np.testing.assert_array_equal(perm[inv], np.arange(Q))
    # narrow shapes: no permutation
    assert _grid_perm(((10, 12), (5, 6)), 64, 32) is None
    assert _n_sub(168) == 2 and _n_sub(128) == 1 and _n_sub(260) == 3
    # w ≡ 1 (mod 127): the last slab must own ix = w-1
    assert _n_sub(255) == 3 and _n_sub(129) == 2


def test_v5_exact_right_edge_column():
    """Samples landing exactly on column W-1 (x0 = W-1, wx0 = 1) of a
    w ≡ 1 (mod 127) level must not be zeroed by slab routing."""
    shapes = ((4, 255),)
    W = 255
    rng = np.random.RandomState(11)
    B, H, D, P, Q = 1, 1, 8, 2, 64
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
    # x = W-1 exactly: loc_x = (W - 0.5) / W; y mid-row
    loc = np.zeros((B, Q, H, 1, P, 2), np.float32)
    loc[..., 0] = (W - 0.5) / W
    loc[..., 1] = 0.5
    attn = rng.rand(B, Q, H, 1, P).astype(np.float32)
    attn /= attn.sum(axis=(-2, -1), keepdims=True)
    loc, attn = jnp.asarray(loc), jnp.asarray(attn)
    ox = _ms_deform_attn_xla(value, shapes, loc, attn)
    assert float(jnp.abs(ox).max()) > 0  # the oracle sees the sample
    out = _run_v5(shapes, value, loc, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ox), atol=1e-4)


def test_v5_grad_path_matches_xla():
    """impl='pallas_v5' end-to-end grads (v5 fwd + shared v4 bwd)."""
    shapes = ((6, 168), (3, 84))
    value, loc, attn = make_inputs(shapes, 1, 2, 8, 2, 1260, 7, (0.0, 1.0), True)

    def fx(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="xla") ** 2)

    def fp(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a, impl="pallas_v5") ** 2)

    gx = jax.grad(fx, argnums=(0, 1, 2))(value, loc, attn)
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(fp, argnums=(0, 1, 2))(value, loc, attn)
    for name, a, b in zip(["dvalue", "dloc", "dattn"], gp, gx):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-4,
            err_msg=name,
        )
