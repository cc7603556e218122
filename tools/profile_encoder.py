"""Ablation timing of the ALIF encoder on TPU: fusion on/off, layer count,
and the raw MSDA op at model shapes. Run: python -u tools/profile_encoder.py
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


def marginal_time(f, *args, n=5):
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

    from __graft_entry__ import _materialize_params
    from rlipv2_tpu.config import FusionConfig, ModelConfig, TextEncoderConfig
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    BATCH, H, W = 8, 832, 1344
    base = ModelConfig(
        text_encoder=TextEncoderConfig(num_layers=12),
        num_queries=200,
        max_obj_texts=81,
        max_verb_texts=117,
        dtype="bfloat16",
    )
    rng = np.random.RandomState(0)
    T = base.max_obj_texts + base.max_verb_texts
    pixels = jnp.asarray(rng.randn(BATCH, H, W, 3).astype(np.float32))
    valid = jnp.ones((BATCH, H, W), bool)
    text_emb = jnp.asarray(
        rng.randn(BATCH, T, base.text_encoder.hidden_size).astype(np.float32)
    )
    text_valid = jnp.ones((BATCH, T), bool)
    dev = jax.devices()[0]

    def time_encode(cfg, label):
        model = RLIPParSeDA(cfg)
        params = _materialize_params(
            model, pixels[:1], valid[:1], text_emb[:1], text_valid[:1],
            cfg.max_obj_texts, jnp.ones((2, 8), jnp.int32),
            jnp.ones((2, 8), jnp.int32),
        )
        p = jax.device_put(params, dev)
        px, v, te, tv = jax.device_put((pixels, valid, text_emb, text_valid), dev)
        enc = jax.jit(
            lambda p, px, v, te, tv: jnp.sum(
                model.apply(p, px, v, te, tv, method=RLIPParSeDA._encode)[
                    "img_memory"
                ].astype(jnp.float32)
            )
        )
        t = marginal_time(enc, p, px, v, te, tv)
        print(f"{label:34s} {t*1000:7.1f} ms", flush=True)
        return t

    time_encode(base, "encode full (6L, GLIP_attn)")
    nf = dataclasses.replace(
        base,
        transformer=dataclasses.replace(
            base.transformer, fusion=FusionConfig(fusion_type="no_fusion")
        ),
    )
    time_encode(nf, "encode no_fusion (6L)")
    l3 = dataclasses.replace(
        nf, transformer=dataclasses.replace(nf.transformer, enc_layers=3)
    )
    time_encode(l3, "encode no_fusion (3L)")

    # raw MSDA op at the encoder's shapes
    from rlipv2_tpu.ops import ms_deform_attn

    shapes = []
    h, w = H // 8, W // 8
    for _ in range(4):
        shapes.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    N = sum(h * w for h, w in shapes)
    print(f"tokens N={N}, levels={shapes}", flush=True)
    D, heads, P = 256, 8, 4
    value = jnp.asarray(rng.randn(BATCH, N, heads, D // heads), jnp.bfloat16)
    loc = jnp.asarray(
        rng.rand(BATCH, N, heads, len(shapes), P, 2).astype(np.float32), jnp.float32
    )
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(BATCH, N, heads, len(shapes) * P), jnp.float32)
    ).reshape(BATCH, N, heads, len(shapes), P)

    for impl in ("pallas", "xla"):
        f = jax.jit(
            lambda v_, l_, a_: jnp.sum(
                ms_deform_attn(
                    v_, tuple(shapes), l_, a_.astype(v_.dtype), impl=impl
                ).astype(jnp.float32)
            )
        )
        try:
            t = marginal_time(f, value, loc, attn)
            print(f"msda {impl:8s} 1 call:            {t*1000:7.1f} ms "
                  f"(x6 = {6*t*1000:.1f})", flush=True)
        except Exception as e:
            print(f"msda {impl}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
