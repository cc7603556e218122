"""uint8 host pipeline: HOITransform(normalize=False) + uint8 collate +
on-device normalize_pixels must match the f32 host-normalized path."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from rlipv2_tpu.data.collate import make_hoi_batch
from rlipv2_tpu.data.transforms import HOITransform, IMAGENET_MEAN, IMAGENET_STD
from rlipv2_tpu.models.layers import normalize_pixels


def _img(seed, h=96, w=128):
    return np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)


def _tgt(n=2, v=7):
    rng = np.random.RandomState(0)
    b = rng.uniform(0, 60, (n, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]
    return {
        "obj_labels": np.zeros(n, np.int64),
        "sub_labels": np.zeros(n, np.int64),
        "verb_labels": np.zeros((n, v), np.float32),
        "sub_boxes": b,
        "obj_boxes": b.copy(),
    }


def test_transform_uint8_matches_normalized():
    """Same rng seed -> identical augmentation; normalize=False output is
    the uint8 pre-image of the normalized output."""
    img = _img(1, 120, 160)
    t = {"boxes": np.zeros((0, 4), np.float32), "labels": np.zeros(0, np.int64)}
    tf_f32 = HOITransform(train=True, rng=random.Random(7))
    tf_u8 = HOITransform(train=True, rng=random.Random(7), normalize=False)
    out_f32, _ = tf_f32(img.copy(), dict(t))
    out_u8, _ = tf_u8(img.copy(), dict(t))
    assert out_u8.dtype == np.uint8
    assert out_f32.shape == out_u8.shape
    renorm = (out_u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out_f32, renorm, atol=1e-6)


def test_collate_follows_dtype():
    imgs_u8 = [_img(0), _img(1, 80, 100)]
    tgts = [_tgt(), _tgt()]
    batch = make_hoi_batch(imgs_u8, tgts, max_triplets=4, n_verb_slots=7)
    assert batch["pixels"].dtype == np.uint8
    imgs_f32 = [im.astype(np.float32) for im in imgs_u8]
    batch_f = make_hoi_batch(imgs_f32, tgts, max_triplets=4, n_verb_slots=7)
    assert batch_f["pixels"].dtype == np.float32
    # padded region zeros either way; real region identical values
    np.testing.assert_array_equal(
        batch["pixels"].astype(np.float32), batch_f["pixels"]
    )


def test_normalize_pixels_device_matches_host():
    u8 = jnp.asarray(_img(3, 64, 64)[None])
    dev = normalize_pixels(u8, jnp.float32)
    host = (np.asarray(u8, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(dev), host, atol=1e-6)
    # float input passes through (no double normalization)
    f = jnp.asarray(host)
    np.testing.assert_allclose(
        np.asarray(normalize_pixels(f, jnp.float32)), host, atol=0
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_model_uint8_forward_matches_f32(dtype):
    """Flagship forward on a uint8 batch == forward on the host-normalized
    f32 batch (tiny config). The bfloat16 leg doubles as a NaN regression:
    the ALIF language mask used float32's finfo.min, which overflows to
    -inf in bf16 and made VALID slots compute 0 * -inf = NaN
    (models/roberta.alif_additive_bool_mask)."""
    import jax

    from rlipv2_tpu.config import (
        BackboneConfig, ModelConfig, TextEncoderConfig, TransformerConfig,
    )
    from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params

    cfg = ModelConfig(
        backbone=BackboneConfig(name="resnet_test", num_outputs=3),
        text_encoder=TextEncoderConfig(
            num_layers=1, hidden_size=32, num_heads=2, intermediate_size=37,
        ),
        transformer=TransformerConfig(
            hidden_dim=32, nheads=4, enc_layers=2, dec_layers=1,
            dim_feedforward=37,
        ),
        num_queries=8,
        max_obj_texts=4,
        max_verb_texts=4,
        dtype=dtype,
    )
    model = RLIPParSeDA(cfg)
    rng = np.random.RandomState(0)
    B, H, W = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    u8 = jnp.asarray(rng.randint(0, 255, (B, H, W, 3), np.uint8))
    f32 = jnp.asarray(
        (np.asarray(u8, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    )
    valid = jnp.ones((B, H, W), bool)
    text = jnp.asarray(rng.randn(B, T, 32).astype(np.float32))
    tvalid = jnp.ones((B, T), bool)
    params = init_model_params(
        model, jax.random.PRNGKey(0), f32, valid, text, tvalid,
        cfg.max_obj_texts, jnp.ones((2, 4), jnp.int32),
        jnp.ones((2, 4), jnp.int32),
    )
    out_u8 = model.apply(params, u8, valid, text, tvalid, cfg.max_obj_texts)
    out_f32 = model.apply(params, f32, valid, text, tvalid, cfg.max_obj_texts)
    a = np.asarray(out_u8["pred_verb_logits"])
    b = np.asarray(out_f32["pred_verb_logits"])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    tol = 1e-5 if dtype == "float32" else 5e-2
    np.testing.assert_allclose(a, b, atol=tol, rtol=tol)
