"""FSDP parameter sharding over the `model` mesh axis: a 2x4 (data x
model) virtual mesh must train with actually-partitioned parameters and
reproduce the replicated step's loss (SURVEY §2.8 reserved axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.config import LossConfig, TrainConfig
from rlipv2_tpu.engine import create_train_state, fsdp_state_sharding, make_train_step
from rlipv2_tpu.engine.train import TrainBatch
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
from rlipv2_tpu.parallel import create_mesh, shard_batch
from rlipv2_tpu.structures import HOITargets
from test_parseda_forward import tiny_config

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def make_batch(cfg, B=8, M=4, seed=0):
    rng = np.random.RandomState(seed)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    return TrainBatch(
        pixels=jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32)),
        pixel_valid=jnp.ones((B, 64, 64), bool),
        text_emb=jnp.asarray(
            rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32)
        ),
        text_valid=jnp.ones((B, T), bool),
        targets=HOITargets(
            obj_labels=jnp.asarray(rng.randint(0, cfg.max_obj_texts - 1, (B, M))),
            sub_labels=jnp.zeros((B, M), jnp.int32),
            verb_labels=jnp.asarray(
                (rng.rand(B, M, cfg.max_verb_texts) > 0.5).astype(np.float32)
            ),
            sub_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
            obj_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
            valid=jnp.ones((B, M), bool),
        ),
    )


def test_fsdp_step_matches_replicated():
    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    batch = make_batch(cfg)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    params = init_model_params(
        model, jax.random.PRNGKey(0),
        batch.pixels[:1], batch.pixel_valid[:1],
        batch.text_emb[:1], batch.text_valid[:1], cfg.max_obj_texts,
        jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32),
    )
    tcfg = TrainConfig(ema=False)
    criterion = SetCriterionHOI(LossConfig())

    # replicated DP baseline on a 1-D mesh
    state, tx = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=10
    )
    mesh1 = create_mesh(8)
    step1 = make_train_step(model, criterion, tx, cfg, tcfg, mesh1)
    with mesh1:
        s1, m1 = step1(state, shard_batch(mesh1, batch))
        loss_repl = float(m1["loss"])

    # hybrid 2 (data) x 4 (model) FSDP
    mesh2 = create_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    state2, tx2 = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=10
    )
    # small min_size so the tiny test model actually shards
    state_sh = fsdp_state_sharding(mesh2, state2, min_size=1 << 10)
    state2 = jax.device_put(state2, state_sh)

    # at least one parameter is genuinely partitioned over `model`
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, state2.params)
    )
    assert any(
        "model" in (s.spec or ()) for s in shardings
    ), "no parameter was sharded on the model axis"

    step2 = make_train_step(
        model, criterion, tx2, cfg, tcfg, mesh2, state_sharding=state_sh
    )
    with mesh2:
        s2, m2 = step2(state2, shard_batch(mesh2, batch))
        loss_fsdp = float(m2["loss"])

    np.testing.assert_allclose(loss_fsdp, loss_repl, rtol=2e-5)
    # updated params agree with the replicated run
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
    )
