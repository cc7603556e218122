"""Swin-L perf pass: where do the 14.4 img/s go? (VERDICT r3 next #5)

Legs, all at the flagship eval shape (832x1344 bs8, bf16):

  swin-l backbone fwd (fused)   SwinTransformer alone, fused Pallas window
                                attention (the default on TPU)
  swin-l backbone fwd (xla)     same, plain-XLA attention
                                (RLIPV2_SWIN_FUSED=0) — the kernel A/B
  swin-l full model fwd         RLIP-ParSeDA-Swin-L forward
  r50 full model fwd            the R50 flagship for the delta
  per-stage swin-l              stages 1..4 timed cumulatively (stage i =
                                cum_i - cum_{i-1})

The R50 encoder+decoder tail is identical, so
(swin_full - r50_full) + r50_backbone attributes the gap to the backbone;
the per-stage split and the attention A/B say where inside Swin it goes.
Prints a table + one JSON line.

Run (single-client TPU tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_swin.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH, H, W = 8, 832, 1344


def marginal_time(f, *args, n=4):
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
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from __graft_entry__ import _materialize_params
    from rlipv2_tpu.config import BackboneConfig, ModelConfig, TextEncoderConfig
    from rlipv2_tpu.models.parseda import RLIPParSeDA
    from rlipv2_tpu.models.swin import SwinTransformer

    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32))
    dev = jax.devices()[0]
    pixels = jax.device_put(pixels, dev)

    rows = {}

    def leg(name, f, *args, n=3):
        try:
            dt = marginal_time(f, *args, n=n) * 1000.0
        except Exception as e:
            print(f"{name}: SKIPPED ({type(e).__name__}: {e})"[:300],
                  file=sys.stderr)
            return None
        rows[name] = round(dt, 1)
        print(f"{name:<34} {dt:9.1f} ms", flush=True)
        return dt

    # --- backbone alone, fused vs xla window attention ---
    bb = SwinTransformer.from_name("swin_large", dtype=jnp.bfloat16)
    bparams = jax.tree_util.tree_map(
        lambda s: jnp.asarray(
            (np.random.RandomState(1).randn(*s.shape) * 0.02).astype(s.dtype)
        ),
        jax.eval_shape(lambda: bb.init(jax.random.PRNGKey(0), pixels[:1])),
    )
    bparams = jax.device_put(bparams, dev)

    def bb_fwd(p, px):
        outs = bb.apply(p, px)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    os.environ["RLIPV2_SWIN_FUSED"] = "1"
    t_fused = leg("swin-l backbone fwd (fused)", jax.jit(bb_fwd), bparams, pixels)
    os.environ["RLIPV2_SWIN_FUSED"] = "0"
    leg("swin-l backbone fwd (xla attn)", jax.jit(bb_fwd), bparams, pixels)
    os.environ["RLIPV2_SWIN_FUSED"] = "1"

    # --- per-stage cumulative split (fused path): truncated specs
    # (depths[:k]) re-timed; stage k marginal = cum_k - cum_{k-1} ---
    import dataclasses as _dc

    from rlipv2_tpu.models.swin import SWIN_SPECS

    full_spec = SWIN_SPECS["swin_large"]
    prev = 0.0
    for k in range(1, 5):
        spec_k = _dc.replace(
            full_spec,
            depths=tuple(full_spec.depths[:k]),
            num_heads=tuple(full_spec.num_heads[:k]),
        )
        bb_k = SwinTransformer(spec_k, out_indices=(k - 1,), dtype=jnp.bfloat16)
        p_k = jax.tree_util.tree_map(
            lambda s: jnp.asarray(
                (np.random.RandomState(1).randn(*s.shape) * 0.02
                 ).astype(s.dtype)
            ),
            jax.eval_shape(lambda m=bb_k: m.init(jax.random.PRNGKey(0),
                                                 pixels[:1])),
        )
        p_k = jax.device_put(p_k, dev)

        def cum_fwd(p, px, m=bb_k):
            outs = m.apply(p, px)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        t = leg(f"swin-l stages 1..{k}", jax.jit(cum_fwd), p_k, pixels)
        if t is not None:
            rows[f"swin-l stage {k} (marginal)"] = round(t - prev, 1)
            prev = t

    # --- full models ---
    for name, bcfg in (
        ("swin-l full model fwd", BackboneConfig(name="swin_large", num_outputs=3)),
        ("r50 full model fwd", BackboneConfig(name="resnet50", num_outputs=3)),
    ):
        cfg = ModelConfig(
            backbone=bcfg,
            text_encoder=TextEncoderConfig(num_layers=12),
            num_queries=200, max_obj_texts=81, max_verb_texts=117,
            dtype="bfloat16",
        )
        model = RLIPParSeDA(cfg)
        T = cfg.max_obj_texts + cfg.max_verb_texts
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
        params, valid, text_emb, text_valid = jax.device_put(
            (params, valid, text_emb, text_valid), dev
        )
        leg(name, jax.jit(
            lambda p, px, v, te, tv, m=model, c=cfg: jnp.sum(
                m.apply(p, px, v, te, tv, c.max_obj_texts)[
                    "pred_verb_logits"].astype(jnp.float32)
            )
        ), params, pixels, valid, text_emb, text_valid)

    print(json.dumps({"profile_swin_ms": rows}), flush=True)


if __name__ == "__main__":
    main()
