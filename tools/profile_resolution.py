"""Resolution shaping — the remaining measured serving lever (SURVEY §6).

Every kernel/quantization direction past the exact formulation's ceiling
has been built, measured, and found unprofitable or fidelity-unproven;
what remains is trading input resolution for throughput. This tool
measures the flagship forward (R50 and Swin-L, exact kernels, bf16) at a
ladder of eval buckets from the reference protocol's shorter-side-800
down to 512, giving capacity planning the img/s curve. Accuracy at
reduced resolution is NOT claimable without real weights — the curve is
a throughput map, the mAP side runs through tools/golden_check.py the
day assets exist.

Run (single-client TPU tunnel — nothing else may touch the TPU):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_resolution.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 8
# (shorter-side setting, padded bucket) — 4:3 landscape like most of HICO
LADDER = (
    (800, (832, 1088)),
    (704, (704, 960)),
    (640, (640, 896)),
    (576, (576, 768)),
    (512, (512, 704)),
)


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
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    import dataclasses as _dc

    from __graft_entry__ import _materialize_params
    from rlipv2_tpu.config import BackboneConfig, ModelConfig, TextEncoderConfig
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    cfg = ModelConfig(
        text_encoder=TextEncoderConfig(num_layers=12),
        num_queries=200,
        max_obj_texts=81,
        max_verb_texts=117,
        dtype="bfloat16",
    )
    swin_cfg = _dc.replace(
        cfg, backbone=BackboneConfig(name="swin_large", num_outputs=3)
    )

    rng = np.random.RandomState(0)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    dev = jax.devices()[0]
    rows = {}

    for label, c in (("r50", cfg), ("swin_l", swin_cfg)):
        model = RLIPParSeDA(c)
        px1 = jnp.asarray(rng.randn(1, 832, 1088, 3).astype(np.float32))
        params = _materialize_params(
            model, px1, jnp.ones((1, 832, 1088), bool),
            jnp.asarray(rng.randn(1, T, 768).astype(np.float32)),
            jnp.ones((1, T), bool), cfg.max_obj_texts,
            jnp.ones((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
        )
        params = jax.device_put(params, dev)
        fwd = jax.jit(
            lambda p, px, v, te, tv, m=model: jnp.sum(
                m.apply(p, px, v, te, tv, cfg.max_obj_texts)[
                    "pred_verb_logits"
                ].astype(jnp.float32)
            )
        )
        for short, (bh, bw) in LADDER:
            px = jax.device_put(
                jnp.asarray(rng.randn(BATCH, bh, bw, 3).astype(np.float32)),
                dev,
            )
            v = jnp.ones((BATCH, bh, bw), bool)
            te = jax.device_put(
                jnp.asarray(
                    rng.randn(BATCH, T, 768).astype(np.float32)
                ),
                dev,
            )
            tv = jnp.ones((BATCH, T), bool)
            try:
                dt = marginal_time(fwd, params, px, v, te, tv, n=3)
            except Exception as e:
                print(f"{label} short={short}: SKIPPED "
                      f"({type(e).__name__}: {e})"[:200], file=sys.stderr)
                continue
            ips = BATCH / dt
            rows[f"{label}_s{short}_{bh}x{bw}"] = round(ips, 2)
            print(f"{label:<7} short {short} ({bh}x{bw}): {ips:7.2f} img/s",
                  flush=True)

    print(json.dumps({"profile_resolution_imgs_per_sec": rows}), flush=True)


if __name__ == "__main__":
    main()
