"""Benchmark: RLIP-ParSeDA-R50 on one TPU chip — batched inference
throughput (primary metric) plus a train-step line.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "baseline_source": ..., "train_step_ms": N, "mfu_pct": N}

Baseline note: the reference repo publishes no throughput (its only speed
artifact is a bs=1 FPS print, reference: engine.py:433-436), and no GPU is
available here to measure it. `vs_baseline` is therefore anchored to the
closest CITABLE public number: the Deformable-DETR paper (Zhu et al.,
ICLR 2021, table 1) reports 19 FPS for R50 Deformable-DETR on a V100.
RLIPv2-ParSeDA does strictly MORE work per image (RoBERTa text fusion in
the encoder + two decoder stacks), so 19 img/s is an optimistic stand-in
for the reference pipeline; the A100 north-star in BASELINE.md:40 remains
>= 5x an A100 anchor. `mfu_pct` (model FLOPs / 197 TFLOP/s bf16 peak) is
reported so the number is self-interpreting on TPU v5e.
"""

from __future__ import annotations

import json
import time

import numpy as np

PYTORCH_ANCHOR_IMGS_PER_SEC = 19.0
BASELINE_SOURCE = (
    "Deformable-DETR R50 @ 19 FPS on V100 (Zhu et al., ICLR 2021); "
    "RLIPv2-ParSeDA adds text fusion + verb decoder on top, so the anchor "
    "favors the reference"
)
V5E_PEAK_FLOPS = 197e12  # bf16

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
            model.apply(p, px, v, te, tv, cfg.max_obj_texts)[
                "pred_verb_logits"
            ].astype(jnp.float32)
        )
    )

    def marginal_time(f, *args, n=5):
        float(f(*args))  # compile

        def run(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = f(*args)
            float(out)  # full sync
            return time.perf_counter() - t0

        run(1)
        t_small = min(run(1) for _ in range(2))
        t_big = min(run(1 + n) for _ in range(2))
        return (t_big - t_small) / n

    dt = marginal_time(fwd, params, pixels, valid, text_emb, text_valid)
    imgs_per_sec = BATCH / dt

    # --- opt-in int8 MSDA inference mode (quantized kernel, <~1% rel.
    # error; never the default) ---
    int8_ips = None
    try:
        import dataclasses as _dc

        i8_cfg = _dc.replace(
            cfg, transformer=_dc.replace(cfg.transformer, msda_impl="pallas_int8")
        )
        i8_model = RLIPParSeDA(i8_cfg)
        fwd8 = jax.jit(
            lambda p, px, v, te, tv: jnp.sum(
                i8_model.apply(p, px, v, te, tv, cfg.max_obj_texts)[
                    "pred_verb_logits"
                ].astype(jnp.float32)
            )
        )
        dt8 = marginal_time(fwd8, params, pixels, valid, text_emb, text_valid)
        int8_ips = round(BATCH / dt8, 2)
    except Exception as e:
        import sys

        print(f"int8 bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # --- train-step line: forward + Hungarian matching + losses + grads ---
    train_ms = None
    try:
        from rlipv2_tpu.config import LossConfig
        from rlipv2_tpu.losses import SetCriterionHOI
        from rlipv2_tpu.structures import HOITargets

        import dataclasses as _dc

        from rlipv2_tpu.config import TransformerConfig

        # encoder remat: the full bs8 train graph misses 16 GB HBM by
        # ~40 MB without it
        tcfg_remat = _dc.replace(cfg.transformer, remat_encoder=True)
        train_cfg = _dc.replace(cfg, transformer=tcfg_remat)
        train_model = RLIPParSeDA(train_cfg)

        M = 24
        criterion = SetCriterionHOI(LossConfig())
        targets = HOITargets(
            obj_labels=jnp.asarray(rng.randint(0, 80, (BATCH, M))),
            sub_labels=jnp.zeros((BATCH, M), jnp.int32),
            verb_labels=jnp.asarray(
                (rng.rand(BATCH, M, cfg.max_verb_texts) > 0.9).astype(np.float32)
            ),
            sub_boxes=jnp.asarray(
                rng.uniform(0.2, 0.8, (BATCH, M, 4)).astype(np.float32)
            ),
            obj_boxes=jnp.asarray(
                rng.uniform(0.2, 0.8, (BATCH, M, 4)).astype(np.float32)
            ),
            valid=jnp.ones((BATCH, M), bool),
        )
        obj_valid = text_valid[:, : cfg.max_obj_texts]
        verb_valid = text_valid[:, cfg.max_obj_texts :]

        def loss_fn(p, px, v, te, tv):
            out = train_model.apply(p, px, v, te, tv, cfg.max_obj_texts)
            losses = criterion(out, targets, obj_valid, verb_valid)
            return criterion.weighted_total(losses)

        gstep = jax.jit(
            lambda p, px, v, te, tv: jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
                jax.grad(loss_fn)(p, px, v, te, tv),
                0.0,
            )
        )
        train_ms = marginal_time(
            gstep, params, pixels, valid, text_emb, text_valid, n=3
        ) * 1000.0
    except Exception as e:  # train line is best-effort; report why
        import sys

        print(f"train-step bench failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        train_ms = None

    # rough model FLOPs/image for MFU: R50 (~4 GFLOP @224^2, scaled to the
    # bucket) + encoder/decoder matmuls; use XLA's own cost analysis.
    try:
        lowered = jax.jit(
            lambda p, px, v, te, tv: model.apply(
                p, px, v, te, tv, cfg.max_obj_texts
            )["pred_verb_logits"]
        ).lower(params, pixels, valid, text_emb, text_valid)
        flops = lowered.compile().cost_analysis()["flops"]
        mfu = 100.0 * (flops / dt) / V5E_PEAK_FLOPS
    except Exception:
        mfu = None

    # --- Swin-L memory proof: flagship with the Swin-L backbone fits and
    # runs at eval resolution on one chip (SURVEY §2.8 / Swin-L configs
    # reference models/swin/backbone.py:105-163) ---
    swin_l_ips = None
    try:
        import dataclasses as _dc

        from rlipv2_tpu.config import BackboneConfig

        swin_cfg = _dc.replace(
            cfg, backbone=BackboneConfig(name="swin_large", num_outputs=3)
        )
        swin_model = RLIPParSeDA(swin_cfg)
        swin_params = _materialize_params(
            swin_model, pixels[:1], valid[:1], text_emb[:1], text_valid[:1],
            cfg.max_obj_texts, jnp.ones((2, 8), jnp.int32),
            jnp.ones((2, 8), jnp.int32),
        )
        swin_params = jax.device_put(swin_params, dev)
        swin_fwd = jax.jit(
            lambda p, px, v, te, tv: jnp.sum(
                swin_model.apply(p, px, v, te, tv, cfg.max_obj_texts)[
                    "pred_verb_logits"
                ].astype(jnp.float32)
            )
        )
        dt_swin = marginal_time(
            swin_fwd, swin_params, pixels, valid, text_emb, text_valid, n=3
        )
        swin_l_ips = BATCH / dt_swin
    except Exception as e:
        import sys

        print(f"swin-l bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    record = {
        "metric": (
            f"RLIP-ParSeDA-R50 batched inference ({H}x{W}, bs{BATCH}, "
            "bf16, random weights)"
        ),
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / PYTORCH_ANCHOR_IMGS_PER_SEC, 2),
        "baseline_source": BASELINE_SOURCE,
        "p50_latency_ms": round(dt * 1000, 1),
    }
    if train_ms is not None:
        record["train_step_ms"] = round(train_ms, 1)
        record["train_imgs_per_sec"] = round(BATCH / (train_ms / 1000.0), 2)
    if mfu is not None:
        record["mfu_pct"] = round(mfu, 1)
    if swin_l_ips is not None:
        record["swin_l_imgs_per_sec"] = round(swin_l_ips, 2)
    if int8_ips is not None:
        record["int8_msda_imgs_per_sec"] = int8_ips
    print(json.dumps(record))


if __name__ == "__main__":
    main()
