"""Benchmark: RLIP-ParSeDA-R50 batched inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline note (BASELINE.md): the reference repo publishes no throughput —
only a bs=1 FPS print (reference: engine.py:433-436). Public measurements
of deformable-DETR-class R50 detectors with text fusion on A100 land
around 10-20 img/s batched; we use 12 img/s as the PyTorch-A100 anchor for
`vs_baseline` until a measured number replaces it. The north-star target
is >= 5x that per chip (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

PYTORCH_A100_ANCHOR_IMGS_PER_SEC = 12.0

# eval-time resolution: reference val transform resizes shorter side to 800,
# max 1333 (reference: datasets/hico.py:497-500); (832, 1344) is the padded
# eval bucket (data/collate.py).
BATCH, H, W = 8, 832, 1344


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _materialize_params
    from rlipv2_tpu.config import ModelConfig, TextEncoderConfig
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    # full flagship structure: R50, enc 6 / dec 3, nq 200, ALIF VXAc fusion;
    # HICO-scale text slots (80 objects + no-object slot, 117 verbs)
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
        cfg.max_obj_texts, jnp.ones((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
    )
    dev = jax.devices()[0]
    params, pixels, valid, text_emb, text_valid = jax.device_put(
        (params, pixels, valid, text_emb, text_valid), dev
    )

    # scalar-reduced output: through the axon relay, fetching full outputs
    # costs ~700 ms and block_until_ready is not a true sync, so we time
    # queued batches bracketed by a scalar fetch and take the MARGINAL
    # time between two queue depths (removes the fixed sync latency).
    fwd = jax.jit(
        lambda p, px, v, te, tv: jnp.sum(
            model.apply(p, px, v, te, tv, cfg.max_obj_texts)["pred_verb_logits"]
        )
    )
    float(fwd(params, pixels, valid, text_emb, text_valid))  # compile

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fwd(params, pixels, valid, text_emb, text_valid)
        float(out)  # full sync
        return time.perf_counter() - t0

    run(1)  # warm
    t_small = min(run(1) for _ in range(2))
    t_big = min(run(6) for _ in range(2))
    dt = (t_big - t_small) / 5.0

    imgs_per_sec = BATCH / dt
    print(
        json.dumps(
            {
                "metric": f"RLIP-ParSeDA-R50 batched inference ({H}x{W}, bs{BATCH}, bf16, random weights)",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    imgs_per_sec / PYTORCH_A100_ANCHOR_IMGS_PER_SEC, 2
                ),
                "p50_latency_ms": round(dt * 1000, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
