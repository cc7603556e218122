"""Train-step profile: where do the flagship's ~1000 ms/step go?

Splits the RLIP-ParSeDA-R50 train step at the bench shape (832x1344 bs8,
bf16, remat encoder — exactly bench.py's train leg) into measured legs on
the real chip:

  fwd                    full forward (inference graph)
  fwd+bwd (remat)        grad wrt params of sum(outputs), encoder remat on
  fwd+bwd (no remat)     same without remat (skipped on OOM)
  criterion+matcher bwd  grad wrt model OUTPUTS of the weighted loss
                         (Hungarian matching + all losses), canned outputs
  optimizer update       AdamW 3-group + global clip on a grads tree
  msda fwd / bwd (op)    one encoder-shape MSDA op forward / VJP

The first four legs decompose the train step (reference workload:
/root/reference/engine.py:45-201); the op legs attribute the bwd gap to
the MSDA kernel vs everything else. Prints a table + one JSON line.

Run (single-client TPU tunnel — nothing else may touch the TPU):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_train.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH, H, W = 8, 832, 1344


def marginal_time(f, *args, n=4):
    """Marginal per-call time between two queue depths (see bench.py)."""
    float(f(*args))  # compile

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = f(*args)
        float(out)
        return time.perf_counter() - t0

    run(1)
    t_small = min(run(1) for _ in range(2))
    t_big = min(run(1 + n) for _ in range(2))
    return (t_big - t_small) / n


def main():
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from __graft_entry__ import _materialize_params
    from rlipv2_tpu.config import LossConfig, ModelConfig, TextEncoderConfig, TrainConfig
    from rlipv2_tpu.engine.optim import build_optimizer
    from rlipv2_tpu.losses import SetCriterionHOI
    from rlipv2_tpu.models.parseda import RLIPParSeDA
    from rlipv2_tpu.ops.ms_deform_attn import ms_deform_attn
    from rlipv2_tpu.structures import HOITargets

    cfg = ModelConfig(
        text_encoder=TextEncoderConfig(num_layers=12),
        num_queries=200,
        max_obj_texts=81,
        max_verb_texts=117,
        dtype="bfloat16",
    )
    model = RLIPParSeDA(cfg)

    rng = np.random.RandomState(0)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    pixels = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32))
    valid = jnp.ones((BATCH, H, W), bool)
    text_emb = jnp.asarray(
        rng.randn(BATCH, T, cfg.text_encoder.hidden_size).astype(np.float32)
    )
    text_valid = jnp.ones((BATCH, T), bool)
    params = _materialize_params(
        model, pixels[:1], valid[:1], text_emb[:1], text_valid[:1],
        cfg.max_obj_texts, jnp.ones((2, 8), jnp.int32),
        jnp.ones((2, 8), jnp.int32),
    )
    dev = jax.devices()[0]
    params, pixels, valid, text_emb, text_valid = jax.device_put(
        (params, pixels, valid, text_emb, text_valid), dev
    )

    M = 24
    criterion = SetCriterionHOI(LossConfig())
    targets = HOITargets(
        obj_labels=jnp.asarray(rng.randint(0, 80, (BATCH, M))),
        sub_labels=jnp.zeros((BATCH, M), jnp.int32),
        verb_labels=jnp.asarray(
            (rng.rand(BATCH, M, cfg.max_verb_texts) > 0.9).astype(np.float32)
        ),
        sub_boxes=jnp.asarray(rng.uniform(0.2, 0.8, (BATCH, M, 4)).astype(np.float32)),
        obj_boxes=jnp.asarray(rng.uniform(0.2, 0.8, (BATCH, M, 4)).astype(np.float32)),
        valid=jnp.ones((BATCH, M), bool),
    )
    obj_valid = text_valid[:, : cfg.max_obj_texts]
    verb_valid = text_valid[:, cfg.max_obj_texts:]

    rows = {}

    def leg(name, f, *args, n=4):
        try:
            dt = marginal_time(f, *args, n=n) * 1000.0
        except Exception as e:  # OOM etc: record and continue
            print(f"{name}: SKIPPED ({type(e).__name__}: {e})"[:300],
                  file=sys.stderr)
            return None
        rows[name] = round(dt, 1)
        print(f"{name:<28} {dt:9.1f} ms", flush=True)
        return dt

    def model_with(remat):
        tcfg = _dc.replace(cfg.transformer, remat_encoder=remat)
        return RLIPParSeDA(_dc.replace(cfg, transformer=tcfg))

    # 1. forward
    fwd_model = model_with(False)
    leg("fwd", jax.jit(
        lambda p, px, v, te, tv: jnp.sum(
            fwd_model.apply(p, px, v, te, tv, cfg.max_obj_texts)[
                "pred_verb_logits"].astype(jnp.float32)
        )
    ), params, pixels, valid, text_emb, text_valid)

    # 2/3. fwd+bwd of the MODEL only (loss = sum of all float outputs),
    # with and without encoder remat
    def param_bwd(m):
        def loss(p, px, v, te, tv):
            out = m.apply(p, px, v, te, tv, cfg.max_obj_texts)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0
            )

        return jax.jit(
            lambda p, px, v, te, tv: jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
                jax.grad(loss)(p, px, v, te, tv), 0.0,
            )
        )

    leg("fwd+bwd model (remat)", param_bwd(model_with(True)),
        params, pixels, valid, text_emb, text_valid, n=3)
    leg("fwd+bwd model (no remat)", param_bwd(model_with(False)),
        params, pixels, valid, text_emb, text_valid, n=3)

    # 2b. RESIDUAL ATTRIBUTION (VERDICT r4 next #5): grad wrt a param
    # SUBSET — XLA DCEs the excluded subtrees' dW chains (and, for the
    # graph-input-side backbone, its whole backward). The marginal vs the
    # full remat step attributes the residual per submodule. Note the
    # semantics: excluding an input-side module (backbone) removes its
    # full backward; excluding a mid-graph module (fusion, decoders)
    # removes only its dW computation — activation grads still chain
    # through it.
    def param_bwd_subset(m, exclude):
        """grad wrt params minus subtrees whose top-level key contains any
        of `exclude`; excluded params enter via closure (constants)."""

        def split(p):
            sub = {k: v for k, v in p["params"].items()
                   if not any(e in k for e in exclude)}
            rest = {k: v for k, v in p["params"].items()
                    if any(e in k for e in exclude)}
            return sub, rest

        def f(p, px, v, te, tv):
            sub, rest = split(p)

            def loss(sub_p):
                merged = {"params": {**sub_p, **rest}}
                out = m.apply(merged, px, v, te, tv, cfg.max_obj_texts)
                return jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b.astype(jnp.float32)), out, 0.0
                )

            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
                jax.grad(loss)(sub), 0.0,
            )

        return jax.jit(f)

    remat_model = model_with(True)
    for label, exclude in (
        ("bwd minus backbone", ("backbone",)),
        ("bwd minus encoder", ("encoder",)),
        ("bwd minus decoders+heads", (
            "ho_decoder", "verb_decoder", "verb_tgt_generator",
            "projection_text", "coord_proj",
        )),
        ("bwd minus input projs", ("input_proj",)),
    ):
        leg(label, param_bwd_subset(remat_model, exclude),
            params, pixels, valid, text_emb, text_valid, n=3)

    # 2c. REMAT-POLICY A/B (VERDICT r4 next #5): what the encoder remat
    # saves vs recomputes. Policies beyond the default trade HBM for
    # skipped recompute; OOM legs are skipped and reported.
    for label, names in (
        ("remat policy +msda_value", ("msda_out", "msda_value")),
        ("remat policy +enc_ffn_out", ("msda_out", "enc_ffn_out")),
    ):
        tcfg_p = _dc.replace(
            cfg.transformer, remat_encoder=True, remat_save_names=names
        )
        m_p = RLIPParSeDA(_dc.replace(cfg, transformer=tcfg_p))
        leg(label, param_bwd(m_p),
            params, pixels, valid, text_emb, text_valid, n=3)

    # 3b. same step with the PROFILING-ONLY zero-backward MSDA: the delta
    # vs leg 2 is the total in-model MSDA-backward cost (kernel + dloc /
    # dattn chain), cleanly separated from every other bwd
    def model_zg(remat):
        tcfg = _dc.replace(
            cfg.transformer, remat_encoder=remat, msda_impl="pallas_zerograd"
        )
        return RLIPParSeDA(_dc.replace(cfg, transformer=tcfg))

    leg("fwd+bwd model (remat, msda zerograd)", param_bwd(model_zg(True)),
        params, pixels, valid, text_emb, text_valid, n=3)

    # 4. criterion + matcher fwd+bwd alone, on canned outputs
    out_shapes = jax.eval_shape(
        lambda p: fwd_model.apply(
            p, pixels, valid, text_emb, text_valid, cfg.max_obj_texts
        ),
        params,
    )
    canned = jax.device_put(
        jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                (np.random.RandomState(1).rand(*s.shape) * 0.1).astype(s.dtype)
            ),
            out_shapes,
        ),
        dev,
    )

    def crit_loss(out):
        return criterion.weighted_total(
            criterion(out, targets, obj_valid, verb_valid)
        )

    leg("criterion+matcher bwd", jax.jit(
        lambda o: jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
            jax.grad(crit_loss)(o), 0.0,
        )
    ), canned)

    # 5. optimizer update alone (grads := params)
    tcfg = TrainConfig(ema=False)
    tx = build_optimizer(tcfg, params["params"], steps_per_epoch=1000)
    opt_state = jax.device_put(tx.init(params["params"]), dev)

    def opt_fn(g, os, p):
        upd, _ = tx.update(g, os, p)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), upd, 0.0
        )

    leg("optimizer update", jax.jit(opt_fn),
        params["params"], opt_state, params["params"])

    # 6. MSDA op fwd / bwd at the encoder shape (one layer's call).
    # Locations are REALISTIC encoder samples — per-query reference point
    # (own normalized grid position) + a few-pixel offset — not uniform
    # random: the v4 kernel's y-windowing keys off spatial locality, and
    # uniform locations inflate the op ~3x vs the in-model distribution.
    shapes = [(104, 168), (52, 84), (26, 42), (13, 21)]
    S = sum(h * w for h, w in shapes)
    nh, D, L, P = 8, 32, 4, 4
    value = jnp.asarray(rng.randn(BATCH, S, nh, D).astype(np.float32)).astype(jnp.bfloat16)
    refs_np = np.concatenate([
        np.stack(
            np.meshgrid(
                (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h,
                indexing="xy",
            ),
            axis=-1,
        ).reshape(h * w, 2)
        for h, w in shapes
    ])  # (S, 2) normalized (x, y)
    wh = np.array([[w, h] for h, w in shapes], np.float32)  # (L, 2)
    off_px = rng.uniform(-3.0, 3.0, (BATCH, S, nh, L, P, 2)).astype(np.float32)
    locs = jnp.asarray(
        refs_np[None, :, None, None, None, :] + off_px / wh[:, None, :]
    ).astype(jnp.bfloat16)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(BATCH, S, nh, L * P).astype(np.float32))
    ).reshape(BATCH, S, nh, L, P).astype(jnp.bfloat16)
    value, locs, attn = jax.device_put((value, locs, attn), dev)

    def msda_fwd(v, l, a):
        return jnp.sum(
            ms_deform_attn(v, shapes, l, a, impl="pallas").astype(jnp.float32)
        )

    t_op_f = leg("msda op fwd (1 layer)", jax.jit(msda_fwd), value, locs, attn, n=8)
    t_op_b = leg("msda op fwd+bwd (1 layer)", jax.jit(
        lambda v, l, a: jnp.sum(
            jax.grad(msda_fwd, argnums=(0, 1, 2))(v, l, a)[0].astype(jnp.float32)
        )
    ), value, locs, attn, n=8)
    if t_op_f and t_op_b:
        rows["msda op bwd-only (1 layer)"] = round(t_op_b - t_op_f, 1)

    print(json.dumps({"profile_train_ms": rows}), flush=True)


if __name__ == "__main__":
    main()
