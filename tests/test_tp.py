"""Tensor parallelism (Megatron-style column/row FFN + fusion-projection
sharding over the `model` axis): loss identical to replicated DP on the
2x4 virtual mesh, and the named weights actually get sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.config import LossConfig, TrainConfig
from rlipv2_tpu.engine import (
    create_train_state,
    make_train_step,
    tp_state_sharding,
)
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
from rlipv2_tpu.parallel import create_mesh, shard_batch
from test_fsdp import make_batch
from test_parseda_forward import tiny_config

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual mesh"
)


def test_tp_step_matches_replicated():
    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    batch = make_batch(cfg)
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
        _, m1 = step1(state, shard_batch(mesh1, batch))
        loss_repl = float(m1["loss"])

    # hybrid 2 (data) x 4 (model) tensor parallelism
    mesh2 = create_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    state2, tx2 = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=10
    )
    state_sh = tp_state_sharding(mesh2, state2)
    state2 = jax.device_put(state2, state_sh)

    # the named FFN/fusion weights must actually be partitioned
    flat = jax.tree_util.tree_flatten_with_path(state2.params)[0]
    sharded = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, v in flat
        if hasattr(v, "sharding")
        and any(s == "model" for s in (v.sharding.spec or ()) if s)
    ]
    assert any("linear1" in n for n in sharded), sharded[:5]
    assert any("linear2" in n for n in sharded)
    assert any("v_proj" in n for n in sharded)

    step2 = make_train_step(
        model, criterion, tx2, cfg, tcfg, mesh2, state_sharding=state_sh
    )
    with mesh2:
        _, m2 = step2(state2, shard_batch(mesh2, batch))
        loss_tp = float(m2["loss"])

    np.testing.assert_allclose(loss_tp, loss_repl, rtol=2e-5)
