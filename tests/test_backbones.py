"""Backbone micro-optimizations: the space-to-depth stem conv."""

import jax
import jax.numpy as jnp
import numpy as np


def test_stem_s2d_equivalence():
    """The space-to-depth stem (4x4/s1 over packed 2x2 blocks) must be
    numerically identical to the reference 7x7/s2 conv it re-lays out."""
    import jax.lax as lax

    from rlipv2_tpu.models.resnet import _StemConvS2D

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 30, 44, 3).astype(np.float32))
    stem = _StemConvS2D(jnp.float32)
    params = stem.init(jax.random.PRNGKey(0), x)
    out = stem.apply(params, x)
    w7 = params["params"]["kernel"]
    ref = lax.conv_general_dilated(
        x, w7, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_stem_s2d_odd_input():
    """Odd spatial sizes are padded to even before packing; output matches
    the 7x7/s2 conv on the zero-padded input."""
    import jax.lax as lax

    from rlipv2_tpu.models.resnet import _StemConvS2D

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 31, 45, 3).astype(np.float32))
    stem = _StemConvS2D(jnp.float32)
    params = stem.init(jax.random.PRNGKey(0), x)
    out = stem.apply(params, x)
    w7 = params["params"]["kernel"]
    xpad = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    ref = lax.conv_general_dilated(
        xpad, w7, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
