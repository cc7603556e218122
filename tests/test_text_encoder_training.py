"""In-graph text encoding: gradients must reach the RoBERTa text encoder
when the TrainBatch carries slot tokens (the reference trains it with its
own lr group, main.py:520-536 text_encoder_lr), and the frozen path must
be unchanged."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlipv2_tpu.config import (
    BackboneConfig,
    LossConfig,
    ModelConfig,
    TextEncoderConfig,
    TrainConfig,
    TransformerConfig,
)
from rlipv2_tpu.engine import create_train_state, make_train_step
from rlipv2_tpu.engine.train import TrainBatch
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
from rlipv2_tpu.structures import HOITargets


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        backbone=BackboneConfig(name="resnet_test", num_outputs=3),
        text_encoder=TextEncoderConfig(
            vocab_size=100, hidden_size=32, num_layers=1, num_heads=2,
            intermediate_size=37, max_position_embeddings=32,
        ),
        transformer=TransformerConfig(
            hidden_dim=32, nheads=4, enc_layers=2, dec_layers=1,
            dim_feedforward=37,
        ),
        num_queries=8,
        max_obj_texts=4,
        max_verb_texts=4,
        dtype="float32",
    )
    model = RLIPParSeDA(cfg)
    rng = np.random.RandomState(0)
    B, H, W, M = 2, 64, 64, 2
    T = cfg.max_obj_texts + cfg.max_verb_texts
    L = 6
    token_ids = jnp.asarray(rng.randint(4, 100, (T, L)), jnp.int32)
    token_mask = jnp.ones((T, L), jnp.int32)
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    text_valid = jnp.ones((B, T), bool)
    targets = HOITargets(
        obj_labels=jnp.asarray(rng.randint(0, 3, (B, M))),
        sub_labels=jnp.zeros((B, M), jnp.int32),
        verb_labels=jnp.asarray(
            (rng.rand(B, M, cfg.max_verb_texts) > 0.5).astype(np.float32)
        ),
        sub_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        obj_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        valid=jnp.ones((B, M), bool),
    )
    params = init_model_params(
        model, jax.random.PRNGKey(0), pixels, valid,
        jnp.zeros((B, T, 32)), text_valid, cfg.max_obj_texts,
        token_ids, token_mask,
    )
    pooled = model.apply(params, token_ids, token_mask,
                         method=RLIPParSeDA.encode_text)
    text_emb = jnp.broadcast_to(pooled[None], (B, T, 32))
    return dict(cfg=cfg, model=model, params=params, pixels=pixels,
                valid=valid, text_valid=text_valid, targets=targets,
                token_ids=token_ids, token_mask=token_mask,
                text_emb=text_emb)


def _step(s, text_tokens):
    cfg = s["cfg"]
    tcfg = TrainConfig(ema=False)
    criterion = SetCriterionHOI(LossConfig())
    state, tx = create_train_state(
        jax.tree_util.tree_map(jnp.copy, s["params"]), tcfg,
        steps_per_epoch=10,
    )
    step = make_train_step(s["model"], criterion, tx, cfg, tcfg, None,
                           deterministic=True, text_tokens=text_tokens)
    batch = TrainBatch(
        pixels=s["pixels"], pixel_valid=s["valid"],
        text_emb=s["text_emb"], text_valid=s["text_valid"],
        targets=s["targets"],
        token_ids=s["token_ids"] if text_tokens else None,
        token_mask=s["token_mask"] if text_tokens else None,
    )
    return step(state, batch)


def test_loss_matches_frozen_path_at_step0(setup):
    """With identical params, encoding the tokens in-graph must give the
    same loss as feeding the precomputed pooled features."""
    _, m_frozen = _step(setup, text_tokens=False)
    _, m_tok = _step(setup, text_tokens=True)
    np.testing.assert_allclose(
        float(m_tok["loss"]), float(m_frozen["loss"]), rtol=1e-5
    )


def test_text_encoder_receives_gradients(setup):
    state_tok, _ = _step(setup, text_tokens=True)
    state_frz, _ = _step(setup, text_tokens=False)

    def leaf(params):
        return np.asarray(
            params["params"]["text_encoder"]["layers"]
            ["attention_self"]["query"]["kernel"][0]
        )

    before = leaf(setup["params"])
    after_tok = leaf(state_tok.params)
    after_frz = leaf(state_frz.params)
    assert np.abs(after_tok - before).max() > 0, "no text-encoder update"
    # frozen path: zero grads -> adam moments zero -> params unchanged
    np.testing.assert_array_equal(after_frz, before)
