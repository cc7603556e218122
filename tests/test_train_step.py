"""Train step on an 8-device CPU mesh: sharding compiles, loss decreases,
frozen params stay frozen."""

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.config import LossConfig, TrainConfig
from rlipv2_tpu.engine import create_train_state, make_train_step
from rlipv2_tpu.engine.train import TrainBatch
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
from rlipv2_tpu.parallel import create_mesh, shard_batch
from rlipv2_tpu.structures import HOITargets
from test_parseda_forward import tiny_config


def make_batch(rng, cfg, B=8, H=64, W=64, M=4):
    T = cfg.max_obj_texts + cfg.max_verb_texts
    targets = HOITargets(
        obj_labels=jnp.asarray(rng.randint(0, cfg.max_obj_texts - 1, (B, M))),
        sub_labels=jnp.zeros((B, M), jnp.int32),
        verb_labels=jnp.asarray(
            (rng.rand(B, M, cfg.max_verb_texts) > 0.5).astype(np.float32)
        ),
        sub_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        obj_boxes=jnp.asarray(rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)),
        valid=jnp.asarray(rng.rand(B, M) > 0.3),
    )
    return TrainBatch(
        pixels=jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        pixel_valid=jnp.ones((B, H, W), bool),
        text_emb=jnp.asarray(
            rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32)
        ),
        text_valid=jnp.ones((B, T), bool),
        targets=targets,
    )


def test_train_step_on_mesh():
    assert len(jax.devices()) == 8
    cfg = tiny_config()
    tcfg = TrainConfig(lr=1e-4, ema=False)
    model = RLIPParSeDA(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng, cfg)

    params = init_model_params(
        model,
        jax.random.PRNGKey(0),
        batch.pixels[:1],
        batch.pixel_valid[:1],
        batch.text_emb[:1],
        batch.text_valid[:1],
        cfg.max_obj_texts,
        jnp.ones((2, 6), jnp.int32),
        jnp.ones((2, 6), jnp.int32),
    )
    criterion = SetCriterionHOI(LossConfig())
    state, tx = create_train_state(params, tcfg, steps_per_epoch=10)

    mesh = create_mesh()
    step = make_train_step(model, criterion, tx, cfg, tcfg, mesh)

    frozen_before = jax.tree_util.tree_map(
        np.asarray, params["params"]["backbone"]["bn1"]
    )
    with mesh:
        sbatch = shard_batch(mesh, batch)
        losses = []
        for i in range(4):
            state, metrics = step(state, sbatch)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses  # overfits one batch
    assert float(metrics["nonfinite"]) == 0.0

    frozen_after = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.params["params"]["backbone"]["bn1"])
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen_before),
        jax.tree_util.tree_leaves(frozen_after),
    ):
        np.testing.assert_array_equal(a, b)


def test_train_step_single_device():
    cfg = tiny_config()
    tcfg = TrainConfig(ema=True)
    model = RLIPParSeDA(cfg)
    rng = np.random.RandomState(1)
    batch = make_batch(rng, cfg, B=2)
    params = init_model_params(
        model,
        jax.random.PRNGKey(0),
        batch.pixels[:1],
        batch.pixel_valid[:1],
        batch.text_emb[:1],
        batch.text_valid[:1],
        cfg.max_obj_texts,
        jnp.ones((2, 6), jnp.int32),
        jnp.ones((2, 6), jnp.int32),
    )
    criterion = SetCriterionHOI(LossConfig())
    state, tx = create_train_state(params, tcfg, steps_per_epoch=10)
    step = make_train_step(model, criterion, tx, cfg, tcfg, mesh=None)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert state.ema_params is not None


def test_gradient_accumulation_matches_mean():
    """K-microbatch accumulation == averaged grads of single steps (same
    params, deterministic loss)."""
    import jax.tree_util as jtu

    cfg = tiny_config()
    tcfg = TrainConfig(lr=1e-4, ema=False)
    model = RLIPParSeDA(cfg)
    rng = np.random.RandomState(3)
    b1 = make_batch(rng, cfg, B=2)
    b2 = make_batch(rng, cfg, B=2)
    params = init_model_params(
        model,
        jax.random.PRNGKey(0),
        b1.pixels[:1], b1.pixel_valid[:1], b1.text_emb[:1], b1.text_valid[:1],
        cfg.max_obj_texts,
        jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32),
    )
    criterion = SetCriterionHOI(LossConfig())

    def fresh_state():
        # donation invalidates buffers; each state needs its own copies
        p = jtu.tree_map(jnp.copy, params)
        return create_train_state(p, tcfg, steps_per_epoch=10)

    state, tx = fresh_state()
    step1 = make_train_step(
        model, criterion, tx, cfg, tcfg, mesh=None, deterministic=True
    )
    stacked = jtu.tree_map(lambda a, b: jnp.stack([a, b]), b1, b2)
    stepk = make_train_step(
        model, criterion, tx, cfg, tcfg, mesh=None, accumulation_steps=2,
        deterministic=True,
    )

    _, m1 = step1(state, b1)
    state2, _ = fresh_state()
    _, m2 = step1(state2, b2)
    state3, _ = fresh_state()
    _, mk = stepk(state3, stacked)
    expect = (float(m1["loss"]) + float(m2["loss"])) / 2
    assert abs(float(mk["loss"]) - expect) < 2e-3 * max(1.0, abs(expect))


def test_freeze_regimes():
    """Fine-tune freezing regimes (reference: main.py:632-688): frozen
    groups stay bit-identical after a train step, unfrozen groups move."""
    import dataclasses

    import jax.tree_util as jtu

    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    rng = np.random.RandomState(5)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    # token path so real gradients reach the text encoder (zero-grad
    # AdamW's lr*wd*p drift underflows float32 at these magnitudes)
    batch = make_batch(rng, cfg, B=2)._replace(
        token_ids=jnp.asarray(rng.randint(5, 50, (T, 6)).astype(np.int32)),
        token_mask=jnp.ones((T, 6), jnp.int32),
    )
    params = init_model_params(
        model,
        jax.random.PRNGKey(0),
        batch.pixels[:1], batch.pixel_valid[:1],
        batch.text_emb[:1], batch.text_valid[:1],
        cfg.max_obj_texts,
        batch.token_ids, batch.token_mask,
    )
    criterion = SetCriterionHOI(LossConfig())

    def run(regime):
        tcfg = TrainConfig(
            lr=1e-2, lr_text_encoder=1e-2, ema=False, freeze_regime=regime
        )
        p = jtu.tree_map(jnp.copy, params)
        state, tx = create_train_state(p, tcfg, steps_per_epoch=10)
        step = make_train_step(
            model, criterion, tx, cfg, tcfg, mesh=None, deterministic=True,
            text_tokens=True,
        )
        state, _ = step(state, batch)
        return jax.device_get(state.params["params"])

    def delta(tree, path_parts):
        sub = tree
        for k in path_parts:
            sub = sub[k]
        return max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(
                jtu.tree_leaves(sub),
                jtu.tree_leaves(_sub(params["params"], path_parts)),
            )
        )

    def _sub(tree, parts):
        for k in parts:
            tree = tree[k]
        return tree

    # frozen_vision: backbone stage 2 frozen, stage 3 + decoders train
    after = run("frozen_vision")
    assert delta(after, ("backbone", "layer2_block0")) == 0.0
    assert delta(after, ("backbone", "layer3_block0")) > 0.0
    assert delta(after, ("ho_decoder",)) > 0.0

    # unfrozen_params: ONLY the text encoder trains
    after = run("unfrozen_params")
    assert delta(after, ("text_encoder",)) > 0.0
    assert delta(after, ("ho_decoder",)) == 0.0
    assert delta(after, ("encoder",)) == 0.0
    assert delta(after, ("backbone", "layer3_block0")) == 0.0

    # frozen_detection: backbone/encoder/ho_decoder/input_proj frozen,
    # verb decoder + heads train
    after = run("frozen_detection")
    assert delta(after, ("backbone", "layer3_block0")) == 0.0
    assert delta(after, ("encoder",)) == 0.0
    assert delta(after, ("ho_decoder",)) == 0.0
    assert delta(after, ("input_proj_0",)) == 0.0
    assert delta(after, ("verb_decoder",)) > 0.0
