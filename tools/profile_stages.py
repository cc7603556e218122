"""Stage-level TPU timing for the flagship forward: backbone, encode
(backbone+proj+ALIF), and full forward — marginal-timed through the axon
relay exactly like bench.py. Run: python -u tools/profile_stages.py
"""

from __future__ import annotations

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
    from rlipv2_tpu.config import ModelConfig, TextEncoderConfig
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    BATCH, H, W = 8, 832, 1344
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

    bb = jax.jit(
        lambda p, px: jnp.sum(
            model.apply(
                p, px.astype(jnp.bfloat16), method=lambda m, x: m.backbone(x)
            )[-1].astype(jnp.float32)
        )
    )
    enc = jax.jit(
        lambda p, px, v, te, tv: jnp.sum(
            model.apply(
                p, px, v, te, tv, method=RLIPParSeDA._encode
            )["img_memory"].astype(jnp.float32)
        )
    )
    full = jax.jit(
        lambda p, px, v, te, tv: jnp.sum(
            model.apply(p, px, v, te, tv, cfg.max_obj_texts)[
                "pred_verb_logits"
            ].astype(jnp.float32)
        )
    )

    t_bb = marginal_time(bb, params, pixels)
    print(f"backbone-only:      {t_bb*1000:7.1f} ms  ({BATCH/t_bb:5.1f} img/s)",
          flush=True)
    t_enc = marginal_time(enc, params, pixels, valid, text_emb, text_valid)
    print(f"encode (bb+ALIF):   {t_enc*1000:7.1f} ms  ({BATCH/t_enc:5.1f} img/s)",
          flush=True)
    t_full = marginal_time(full, params, pixels, valid, text_emb, text_valid)
    print(f"full forward:       {t_full*1000:7.1f} ms  ({BATCH/t_full:5.1f} img/s)",
          flush=True)
    print(f"-> encoder stack:   {(t_enc-t_bb)*1000:7.1f} ms", flush=True)
    print(f"-> decoders+heads:  {(t_full-t_enc)*1000:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
