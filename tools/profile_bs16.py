"""Why is bs16 NOT faster per image than bs8? (VERDICT r4 weak #6)

BENCH_r04: dist bs8 38.54 img/s vs dist bs16 37.07; bs16@832x1088 38.23.
Doubling batch should amortize glue, so going down implies HBM pressure,
padding, or a kernel grid that degrades at bs16. This tool measures, at
the dominant serving bucket (832x1088):

  full model fwd            bs8 vs bs16 (per-image ms)
  MSDA op alone             bs8 vs bs16 (per-op ms, realistic locations)
  model minus MSDA kernel   bs8 vs bs16 (zero-cost-backward exact fwd is
                            still the kernel; instead use the XLA-gather
                            impl as the non-Pallas A/B)

Run (single-client TPU tunnel — nothing else may touch the TPU):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_bs16.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

H, W = 832, 1088


def marginal_time(f, *args, n=4):
    float(f(*args))

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
    from rlipv2_tpu.config import ModelConfig, TextEncoderConfig
    from rlipv2_tpu.models.parseda import RLIPParSeDA
    from rlipv2_tpu.ops.ms_deform_attn import ms_deform_attn

    cfg = ModelConfig(
        text_encoder=TextEncoderConfig(num_layers=12),
        num_queries=200,
        max_obj_texts=81,
        max_verb_texts=117,
        dtype="bfloat16",
    )
    i8_cfg = _dc.replace(
        cfg, transformer=_dc.replace(cfg.transformer, msda_impl="pallas_int8")
    )
    xla_cfg = _dc.replace(
        cfg, transformer=_dc.replace(cfg.transformer, msda_impl="xla")
    )

    rng = np.random.RandomState(0)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    dev = jax.devices()[0]

    model = RLIPParSeDA(cfg)
    px1 = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
    params = _materialize_params(
        model, px1, jnp.ones((1, H, W), bool),
        jnp.asarray(rng.randn(1, T, 768).astype(np.float32)),
        jnp.ones((1, T), bool), cfg.max_obj_texts,
        jnp.ones((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
    )
    params = jax.device_put(params, dev)

    rows = {}

    def leg(name, f, *args, n=4):
        try:
            dt = marginal_time(f, *args, n=n) * 1000.0
        except Exception as e:
            print(f"{name}: SKIPPED ({type(e).__name__}: {e})"[:300],
                  file=sys.stderr)
            return None
        rows[name] = round(dt, 2)
        print(f"{name:<36} {dt:9.2f} ms", flush=True)
        return dt

    def inputs(b):
        px = jnp.asarray(rng.randn(b, H, W, 3).astype(np.float32))
        v = jnp.ones((b, H, W), bool)
        te = jnp.asarray(rng.randn(b, T, 768).astype(np.float32))
        tv = jnp.ones((b, T), bool)
        return jax.device_put((px, v, te, tv), dev)

    def fwd(c):
        m = RLIPParSeDA(c)
        return jax.jit(
            lambda p, px, v, te, tv: jnp.sum(
                m.apply(p, px, v, te, tv, cfg.max_obj_texts)[
                    "pred_verb_logits"
                ].astype(jnp.float32)
            )
        )

    for b in (8, 16):
        args = inputs(b)
        for label, c in (("int8", i8_cfg), ("exact", cfg), ("xla-msda", xla_cfg)):
            n = 3 if b == 16 else 4
            dt = leg(f"model fwd {label} bs{b}", fwd(c), params, *args, n=n)
            if dt:
                rows[f"model fwd {label} bs{b} per-img"] = round(dt / b, 2)

    # MSDA op alone at the (832,1088) encoder shape, realistic locations
    shapes = [(104, 136), (52, 68), (26, 34), (13, 17)]
    S = sum(h * w for h, w in shapes)
    nh, D, L, P = 8, 32, 4, 4
    refs_np = np.concatenate([
        np.stack(
            np.meshgrid(
                (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h,
                indexing="xy",
            ),
            axis=-1,
        ).reshape(h * w, 2)
        for h, w in shapes
    ])
    wh = np.array([[w, h] for h, w in shapes], np.float32)

    def op_inputs(b):
        value = jnp.asarray(
            rng.randn(b, S, nh, D).astype(np.float32)
        ).astype(jnp.bfloat16)
        off_px = rng.uniform(-3.0, 3.0, (b, S, nh, L, P, 2)).astype(np.float32)
        locs = jnp.asarray(
            refs_np[None, :, None, None, None, :] + off_px / wh[:, None, :]
        ).astype(jnp.bfloat16)
        attn = jax.nn.softmax(
            jnp.asarray(rng.randn(b, S, nh, L * P).astype(np.float32))
        ).reshape(b, S, nh, L, P).astype(jnp.bfloat16)
        return jax.device_put((value, locs, attn), dev)

    def op_fwd(v, l, a):
        return jnp.sum(
            ms_deform_attn(v, shapes, l, a, impl="pallas").astype(jnp.float32)
        )

    for b in (8, 16):
        args = op_inputs(b)
        dt = leg(f"msda op bs{b}", jax.jit(op_fwd), *args, n=6)
        if dt:
            rows[f"msda op bs{b} per-img"] = round(dt / b, 3)

    print(json.dumps({"profile_bs16_ms": rows}), flush=True)


if __name__ == "__main__":
    main()
