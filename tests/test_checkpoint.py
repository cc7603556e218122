"""Orbax checkpoint save/restore roundtrip of a TrainState."""

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.config import TrainConfig
from rlipv2_tpu.engine.checkpoint import CheckpointManager
from rlipv2_tpu.engine.train import TrainState
import optax


def test_roundtrip(tmp_path):
    params = {"params": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}}
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        opt_state=tx.init(params["params"]),
        ema_params=None,
        rng=jax.random.PRNGKey(1),
    )
    mgr = CheckpointManager(tmp_path / "ckpt", keep=2)
    mgr.save(7, state, config=TrainConfig())
    assert mgr.latest_step() == 7

    like = jax.tree_util.tree_map(np.zeros_like, state)
    restored = mgr.restore(like)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["w"]),
        np.asarray(state.params["params"]["w"]),
    )
    mgr.close()
    assert (tmp_path / "ckpt" / "config.json").exists()


def test_keep_last_n(tmp_path):
    params = {"params": {"w": jnp.zeros(2)}}
    tx = optax.sgd(1e-2)
    mgr = CheckpointManager(tmp_path / "c2", keep=2)
    for s in (1, 2, 3):
        state = TrainState(
            step=jnp.asarray(s, jnp.int32),
            params=params,
            opt_state=tx.init(params["params"]),
            ema_params=None,
            rng=jax.random.PRNGKey(0),
        )
        mgr.save(s, state)
    assert mgr.latest_step() == 3
    like = jax.tree_util.tree_map(np.zeros_like, state)
    assert mgr.restore(like, step=3) is not None
    mgr.close()
