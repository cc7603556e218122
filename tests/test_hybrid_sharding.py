"""Hybrid TP+FSDP sharding (`engine.hybrid_state_sharding`): one program
whose rules are the union of the Megatron TP column/row pairs and ZeRO-3
FSDP for everything else — the single-compile leg the multichip dryrun
uses to validate both rule sets (VERDICT r4 next #1b).

Also locks the r4 next #4 fix: gather-consumed embedding tables (RoBERTa
word/position/token_type) must be REPLICATED by the FSDP rule, not
sharded-then-all-gathered (the "involuntary full rematerialization" XLA
SPMD warning observed in MULTICHIP_r04's tail)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.config import LossConfig, TrainConfig
from rlipv2_tpu.engine import (
    create_train_state,
    fsdp_state_sharding,
    hybrid_state_sharding,
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


def test_embedding_tables_replicated_under_fsdp():
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
    mesh = create_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    state, _ = create_train_state(params, tcfg, steps_per_epoch=10)
    sh = fsdp_state_sharding(mesh, state, min_size=1)  # shard EVERYTHING big enough

    flat, _ = jax.tree_util.tree_flatten_with_path(sh.params)
    n_embed = 0
    for path, s in flat:
        if str(getattr(path[-1], "key", "")) == "embedding":
            n_embed += 1
            assert not (s.spec or ()), (
                f"embedding table sharded on the model axis: {path}"
            )
    assert n_embed >= 3, f"expected RoBERTa embedding tables, saw {n_embed}"


def test_hybrid_rules_union_tp_and_fsdp():
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
    mesh = create_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    state, _ = create_train_state(params, tcfg, steps_per_epoch=10)
    tp = tp_state_sharding(mesh, state)
    hy = hybrid_state_sharding(mesh, state, min_size=1 << 10)

    # every TP-ruled param keeps its TP sharding in the hybrid; everything
    # TP leaves replicated falls through to an FSDP rule
    n_tp = n_fsdp_only = 0
    for (path, s_tp), (path2, s_hy) in zip(
        jax.tree_util.tree_leaves_with_path(tp.params),
        jax.tree_util.tree_leaves_with_path(hy.params),
    ):
        assert path == path2
        if s_tp.spec or ():
            n_tp += 1
            assert s_hy == s_tp, f"hybrid dropped TP rule at {path}"
        elif s_hy.spec or ():
            n_fsdp_only += 1
    assert n_tp > 0, "TP rules matched nothing"
    assert n_fsdp_only > 0, "FSDP fallback matched nothing beyond TP"


def test_hybrid_handles_ema_state():
    """EMA params are part of TrainState; the hybrid rule union must
    produce shardings for them too (regression guard for the tree_map
    None/is_leaf handling)."""
    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    batch = make_batch(cfg)
    params = init_model_params(
        model, jax.random.PRNGKey(0),
        batch.pixels[:1], batch.pixel_valid[:1],
        batch.text_emb[:1], batch.text_valid[:1], cfg.max_obj_texts,
        jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32),
    )
    state, _ = create_train_state(
        params, TrainConfig(ema=True), steps_per_epoch=10
    )
    mesh = create_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    sh = hybrid_state_sharding(mesh, state, min_size=1 << 10)
    assert sh.ema_params is not None
    leaves = jax.tree_util.tree_leaves(
        sh.ema_params, is_leaf=lambda x: hasattr(x, "spec")
    )
    assert leaves and any("model" in (s.spec or ()) for s in leaves)


def test_hybrid_step_matches_replicated():
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

    state, tx = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=10
    )
    mesh1 = create_mesh(8)
    step1 = make_train_step(model, criterion, tx, cfg, tcfg, mesh1)
    with mesh1:
        s1, m1 = step1(state, shard_batch(mesh1, batch))
        loss_repl = float(m1["loss"])

    mesh2 = create_mesh(8, axis_names=("data", "model"), shape=(2, 4))
    state2, tx2 = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=10
    )
    sh = hybrid_state_sharding(mesh2, state2, min_size=1 << 10)
    state2 = jax.device_put(state2, sh)
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, state2.params)
    )
    assert any("model" in (s.spec or ()) for s in shardings)

    step2 = make_train_step(
        model, criterion, tx2, cfg, tcfg, mesh2, state_sharding=sh
    )
    with mesh2:
        s2, m2 = step2(state2, shard_batch(mesh2, batch))
        loss_hy = float(m2["loss"])

    np.testing.assert_allclose(loss_hy, loss_repl, rtol=2e-5)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5
    )
