"""HLO size census: where do the flagship train step's instructions go?

Lowers (traces) the tiny flagship-structure train step from
`__graft_entry__.dryrun_multichip` plus its individual components on the
CPU backend and prints StableHLO line counts — the proxy for XLA compile
cost that round 3's multichip dryrun paid (~75 min cold on one host core,
VERDICT r3 weak #1). Run hermetically:

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/hlo_size.py

No compile happens — only tracing/lowering — so this finishes in minutes.
"""

from __future__ import annotations

import sys

import numpy as np


def _lines(lowered) -> int:
    return lowered.as_text().count("\n")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    import __graft_entry__ as g
    from rlipv2_tpu.config import LossConfig, TrainConfig
    from rlipv2_tpu.engine import create_train_state, make_train_step
    from rlipv2_tpu.engine.train import TrainBatch
    from rlipv2_tpu.losses import SetCriterionHOI
    from rlipv2_tpu.models.parseda import RLIPParSeDA
    from rlipv2_tpu.structures import HOITargets

    cfg = g._small_flagship_config(tiny=True)
    model = RLIPParSeDA(cfg)

    B, H, W, M = 2, 64, 64, 4
    T = cfg.max_obj_texts + cfg.max_verb_texts
    rng = np.random.RandomState(0)
    batch = TrainBatch(
        pixels=jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        pixel_valid=jnp.ones((B, H, W), bool),
        text_emb=jnp.asarray(
            rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32)
        ),
        text_valid=jnp.ones((B, T), bool),
        targets=HOITargets(
            obj_labels=jnp.asarray(
                rng.randint(0, cfg.max_obj_texts - 1, (B, M))
            ),
            sub_labels=jnp.zeros((B, M), jnp.int32),
            verb_labels=jnp.asarray(
                (rng.rand(B, M, cfg.max_verb_texts) > 0.5).astype(np.float32)
            ),
            sub_boxes=jnp.asarray(
                rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)
            ),
            obj_boxes=jnp.asarray(
                rng.uniform(0.3, 0.7, (B, M, 4)).astype(np.float32)
            ),
            valid=jnp.ones((B, M), bool),
        ),
    )
    params = g._materialize_params(
        model, batch.pixels[:1], batch.pixel_valid[:1], batch.text_emb[:1],
        batch.text_valid[:1], cfg.max_obj_texts,
        jnp.ones((2, 6), jnp.int32), jnp.ones((2, 6), jnp.int32),
    )

    rows = []

    # 1. forward only
    fwd = jax.jit(
        lambda p, px, v, te, tv: model.apply(
            p, px, v, te, tv, cfg.max_obj_texts
        )["pred_verb_logits"]
    )
    rows.append((
        "forward (full model)",
        _lines(fwd.lower(params, batch.pixels, batch.pixel_valid,
                         batch.text_emb, batch.text_valid)),
    ))

    # 2. criterion + matcher on the forward's output shapes
    criterion = SetCriterionHOI(LossConfig())
    out_shapes = jax.eval_shape(
        lambda p: model.apply(
            p, batch.pixels, batch.pixel_valid, batch.text_emb,
            batch.text_valid, cfg.max_obj_texts,
        ),
        params,
    )
    out = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), out_shapes
    )
    obj_valid = batch.text_valid[:, : cfg.max_obj_texts]
    verb_valid = batch.text_valid[:, cfg.max_obj_texts:]
    crit_fn = jax.jit(
        lambda o: criterion.weighted_total(
            criterion(o, batch.targets, obj_valid, verb_valid)
        )
    )
    rows.append(("criterion + matcher", _lines(crit_fn.lower(out))))

    # 3. optimizer update alone
    tcfg = TrainConfig(ema=False)
    state, tx = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=10
    )
    opt_fn = jax.jit(
        lambda grads, os, p: tx.update(grads, os, p)
    )
    rows.append((
        "optimizer update (AdamW 3-group)",
        _lines(opt_fn.lower(state.params["params"], state.opt_state,
                            state.params["params"])),
    ))

    # 4. full train step (fwd + bwd + matcher + update)
    state2, tx2 = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=10
    )
    step = make_train_step(model, criterion, tx2, cfg, tcfg, None)
    rows.append(("FULL train step", _lines(step.lower(state2, batch))))

    # component breakdown of the forward
    from rlipv2_tpu.models.roberta import RobertaModel

    tm = RobertaModel(cfg.text_encoder, jnp.float32)
    ids = jnp.ones((4, 6), jnp.int32)
    mask = jnp.ones((4, 6), jnp.int32)
    tp = jax.eval_shape(lambda: tm.init(jax.random.PRNGKey(0), ids, mask))
    tp = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), tp)
    rows.append((
        f"roberta text encoder ({cfg.text_encoder.num_layers} layers)",
        _lines(jax.jit(lambda p: tm.apply(p, ids, mask)).lower(tp)),
    ))

    print()
    width = max(len(r[0]) for r in rows)
    for name, n in rows:
        print(f"{name:<{width}}  {n:>8} stablehlo lines")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
