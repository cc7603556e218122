"""Metric-level error bound for the int8 MSDA inference path.

The int8 kernel's existing contract is tensor-level (~1-2% rel. error,
tests/test_msda_v4.py). This gate bounds it at the JUDGED metric: same
model, same weights, same images -> PostProcessHOI -> HICOEvaluator,
exact vs int8, mAP delta < 0.1 points (VERDICT r3 next #4) — at a TINY
config. NOTE (round 5): the same protocol AT FLAGSHIP DIMS on-chip
measured a ~25-point delta (bench.py int8_msda_map_delta_points), so the
path was demoted from the eval default; this test remains as the
tiny-config contract + protocol guard. The GT fixture is canned from the exact path's own
top detections, so the mAP sits mid-range (neither 0 nor saturated) and a
score/box perturbation moves it.

Reference contracts: PostProcessHOI /root/reference/models/hoi.py:4769-4873,
mAP protocol /root/reference/datasets/hico_eval.py:351-394.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: F401,E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from rlipv2_tpu.config import (  # noqa: E402
    FusionConfig,
    ModelConfig,
    TextEncoderConfig,
    TransformerConfig,
)
from rlipv2_tpu.eval.int8_gate import map_delta_points  # noqa: E402
from rlipv2_tpu.eval.postprocess import postprocess_hoi, to_image_results  # noqa: E402
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params  # noqa: E402


def _cfg(impl: str) -> ModelConfig:
    # deliberately tiny: the Pallas kernels run in interpret mode on the
    # CPU suite, which costs seconds per pallas_call — enc/dec layer
    # counts and image size directly bound the test's wall clock
    return ModelConfig(
        text_encoder=TextEncoderConfig(
            vocab_size=1000, hidden_size=64, num_layers=1, num_heads=4,
            intermediate_size=128, max_position_embeddings=64,
        ),
        transformer=TransformerConfig(
            hidden_dim=64, nheads=4, enc_layers=2, dec_layers=1,
            dim_feedforward=128, msda_impl=impl,
            fusion=FusionConfig(embed_dim=128, num_heads=4),
        ),
        num_queries=16,
        max_obj_texts=8,
        max_verb_texts=8,
        dtype="float32",
    )


def _forward(impl, params, pixels, valid, text_emb, text_valid, n_obj):
    cfg = _cfg(impl)
    model = RLIPParSeDA(cfg)
    with pltpu.force_tpu_interpret_mode():
        return jax.device_get(
            model.apply(params, pixels, valid, text_emb, text_valid, n_obj)
        )




def test_int8_msda_map_delta_under_0p1_points():
    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    cfg = _cfg("pallas")
    T = cfg.max_obj_texts + cfg.max_verb_texts
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    text_emb = jnp.asarray(
        rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32)
    )
    text_valid = jnp.ones((B, T), bool)

    model = RLIPParSeDA(cfg)
    with pltpu.force_tpu_interpret_mode():
        params = init_model_params(
            model, jax.random.PRNGKey(0), pixels[:1], valid[:1],
            text_emb[:1], text_valid[:1], cfg.max_obj_texts,
            jnp.ones((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
        )

    orig_sizes = jnp.asarray([[H, W]] * B, jnp.float32)
    out_exact = _forward("pallas", params, pixels, valid, text_emb,
                         text_valid, cfg.max_obj_texts)
    out_int8 = _forward("pallas_int8", params, pixels, valid, text_emb,
                        text_valid, cfg.max_obj_texts)

    res_exact = to_image_results(postprocess_hoi(
        jax.tree_util.tree_map(jnp.asarray, out_exact), orig_sizes))
    res_int8 = to_image_results(postprocess_hoi(
        jax.tree_util.tree_map(jnp.asarray, out_int8), orig_sizes))

    # shared canned-GT protocol (eval/int8_gate.py — also run ON-CHIP at
    # flagship dims by bench.py, whose measured delta backs the eval-default
    # claim; this CPU test guards the protocol + the tiny-config bound)
    delta, m_e, m_8 = map_delta_points(
        res_exact, res_int8, cfg.max_verb_texts, cfg.max_obj_texts
    )
    # 0.1 mAP points on the reference's 0-100 scale
    assert delta < 0.1, (
        f"int8 mAP delta {delta:.3f} points "
        f"(exact {m_e * 100:.2f}, int8 {m_8 * 100:.2f})"
    )
