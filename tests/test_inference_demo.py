"""Single-image inference demo on the tiny model."""

import numpy as np
import jax
import jax.numpy as jnp

from rlipv2_tpu.engine.loops import CachedTextEncoder
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
from rlipv2_tpu.tools.inference_demo import run_inference
from test_parseda_forward import tiny_config


def test_run_inference_topk():
    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    B, H, W = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    params = init_model_params(
        model, jax.random.PRNGKey(0),
        jnp.zeros((B, H, W, 3)), jnp.ones((B, H, W), bool),
        jnp.zeros((B, T, cfg.text_encoder.hidden_size)), jnp.ones((B, T), bool),
        cfg.max_obj_texts,
        jnp.ones((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32),
    )
    rng = np.random.RandomState(0)
    enc = CachedTextEncoder(
        lambda texts: rng.randn(len(texts), cfg.text_encoder.hidden_size).astype(np.float32)
    )
    image = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
    results = run_inference(
        model, params, image, enc, cfg,
        object_texts=["person", "horse", "dog", "cup"],  # 4 + no-obj = 5 slots
        verb_texts=["ride", "hold", "pet", "watch", "feed", "kick", "wash"],
        top_k=5, bucket=(128, 128), val_size=96,
    )
    assert len(results) == 5
    assert results[0]["score"] >= results[-1]["score"]
    for r in results:
        assert r["object"] in ["person", "horse", "dog", "cup"]
        assert r["verb"] in ["ride", "hold", "pet", "watch", "feed", "kick", "wash"]
        assert len(r["sub_box"]) == 4
