"""Swin backbone: shapes, shifted-window mask semantics, ParSeDA integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.models.swin import (
    SwinTransformer,
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def test_window_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 5).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 4, 4, 5)
    back = window_reverse(w, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_range():
    ws = 4
    idx = relative_position_index(ws)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < (2 * ws - 1) ** 2
    assert (np.diag(idx) == idx[0, 0]).all()  # same relative offset (0,0)


def test_shift_mask_blocks_cross_region():
    m = shifted_window_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert (m[0] == 0).all()  # interior window: fully visible


def test_swin_forward_shapes():
    model = SwinTransformer.from_name("swin_test")
    x = jnp.zeros((2, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    # strides 8, 16, 32 with embed 32 -> dims 64, 128, 256
    assert [o.shape for o in outs] == [
        (2, 8, 12, 64),
        (2, 4, 6, 128),
        (2, 2, 3, 256),
    ]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_parseda_with_swin_backbone():
    from rlipv2_tpu.config import BackboneConfig
    from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
    from test_parseda_forward import tiny_config

    cfg = dataclasses.replace(
        tiny_config(), backbone=BackboneConfig(name="swin_test", num_outputs=3)
    )
    model = RLIPParSeDA(cfg)
    B, H, W = 1, 64, 64
    pixels = jnp.zeros((B, H, W, 3))
    valid = jnp.ones((B, H, W), bool)
    te = jnp.zeros((B, 12, cfg.text_encoder.hidden_size))
    tv = jnp.ones((B, 12), bool)
    params = init_model_params(
        model, jax.random.PRNGKey(0), pixels, valid, te, tv, 5,
        jnp.ones((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32),
    )
    out = model.apply(params, pixels, valid, te, tv, 5)
    assert np.isfinite(np.asarray(out["pred_verb_logits"])).all()
