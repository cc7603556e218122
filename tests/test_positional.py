"""Positional encodings vs the reference formulas (re-derived in numpy/torch)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.ops import (
    gen_sineembed_for_position,
    inverse_sigmoid,
    sine_position_embedding,
)

torch = pytest.importorskip("torch")


def torch_sine_pos(mask_valid, num_pos_feats=128, temperature=10000, normalize=True):
    """Independent torch re-derivation of DETR's PositionEmbeddingSine."""
    not_mask = torch.from_numpy(mask_valid).float()
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    if normalize:
        eps = 1e-6
        scale = 2 * math.pi
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).numpy()


def test_sine_pos_vs_reference_formula():
    rng = np.random.RandomState(0)
    B, H, W = 2, 9, 11
    valid = np.ones((B, H, W), dtype=bool)
    valid[0, 6:, :] = False  # padded rows
    valid[0, :, 8:] = False
    out = sine_position_embedding(jnp.asarray(valid), num_pos_feats=64)
    ref = torch_sine_pos(valid, num_pos_feats=64)
    assert out.shape == (B, H, W, 128)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)


def test_gen_sineembed_shapes_and_values():
    rng = np.random.RandomState(1)
    pos2 = rng.rand(5, 3, 2).astype(np.float32)
    pos4 = rng.rand(5, 3, 4).astype(np.float32)
    e2 = gen_sineembed_for_position(jnp.asarray(pos2))
    e4 = gen_sineembed_for_position(jnp.asarray(pos4))
    assert e2.shape == (5, 3, 256)
    assert e4.shape == (5, 3, 512)

    # re-derive one coordinate by hand
    dim_t = 10000 ** (2 * (np.arange(128) // 2) / 128)
    v = pos2[0, 0, 1] * 2 * math.pi / dim_t
    expect = np.stack([np.sin(v[0::2]), np.cos(v[1::2])], -1).reshape(-1)
    np.testing.assert_allclose(np.asarray(e2[0, 0, :128]), expect, atol=1e-5)


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.01, 0.3, 0.5, 0.9, 0.999])
    y = 1 / (1 + np.exp(-np.asarray(inverse_sigmoid(x))))
    np.testing.assert_allclose(y, np.asarray(x), atol=1e-3)


def test_learned_position_embedding():
    """Learned absolute pos embedding (reference:
    models/position_encoding.py:61-86): row/col tables, [x || y] concat."""
    import jax

    from rlipv2_tpu.ops.positional import LearnedPositionEmbedding

    m = LearnedPositionEmbedding(num_pos_feats=8)
    v = jnp.ones((2, 5, 7), bool)
    params = m.init(jax.random.PRNGKey(0), v)
    out = np.asarray(m.apply(params, v))
    assert out.shape == (2, 5, 7, 16)
    # first half = col embedding (constant down rows, varies across cols)
    assert (out[0, 0, 0, :8] == out[0, 3, 0, :8]).all()
    assert not (out[0, 0, 0, :8] == out[0, 0, 3, :8]).all()
    # second half = row embedding (constant across cols, varies down rows)
    assert (out[0, 2, 0, 8:] == out[0, 2, 5, 8:]).all()
    assert not (out[0, 0, 0, 8:] == out[0, 3, 0, 8:]).all()
