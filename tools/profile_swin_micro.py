"""Micro-profile of SwinBlock internals at Swin-L stage shapes.

profile_swin.py showed stage 1 at ~39 ms/block for ~0.5 TFLOP (≈6% MFU)
and stage 3 at ~10 ms/block (~27% MFU) — far off the matmul bound, and
the fused-vs-XLA attention A/B was parity, so the cost is NOT the
attention math. This tool times each piece of a block standalone at the
real stage shapes (832x1344 bs8 input):

  stage 1: (8, 210, 336, 192), 2 blocks, h=6,  nW=30*48
  stage 3: (8,  56,  84, 768), 18 blocks, h=24, nW=8*12

Legs per stage: full block, LayerNorm, roll, window partition+reverse,
qkv+proj+mlp matmuls (the MXU floor), fused attention op alone, softmax-
equivalent elementwise pass. The residual (block - sum of pieces) is
XLA fusion/relayout overhead.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_swin_micro.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 8


def marginal_time(f, *args, n=8):
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

    from rlipv2_tpu.models.swin import (
        SwinBlock, shifted_window_mask, window_partition, window_reverse,
    )
    from rlipv2_tpu.ops.window_attention import fused_window_attention

    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    rows = {}

    def leg(name, f, *args, n=8):
        try:
            dt = marginal_time(jax.jit(f), *args, n=n) * 1000.0
        except Exception as e:
            print(f"{name}: SKIPPED ({type(e).__name__}: {e})"[:300],
                  file=sys.stderr)
            return None
        rows[name] = round(dt, 2)
        print(f"{name:<44} {dt:9.2f} ms", flush=True)
        return dt

    ws = 7
    for tag, (Hs, Ws, C, h) in {
        "s1": (210, 336, 192, 6),
        "s3": (56, 84, 768, 24),
    }.items():
        x = jax.device_put(
            jnp.asarray(rng.randn(BATCH, Hs, Ws, C).astype(np.float32))
            .astype(jnp.bfloat16), dev)
        blk = SwinBlock(C, h, ws, shift=0, dtype=jnp.bfloat16)
        bp = jax.device_put(
            jax.tree_util.tree_map(
                lambda s: jnp.asarray(
                    (np.random.RandomState(1).randn(*s.shape) * 0.02
                     ).astype(s.dtype)),
                jax.eval_shape(lambda m=blk, xx=x: m.init(
                    jax.random.PRNGKey(0), xx)),
            ), dev)
        blk_s = SwinBlock(C, h, ws, shift=3, dtype=jnp.bfloat16)

        leg(f"{tag} full block (shift=0)",
            lambda p, xx, m=blk: jnp.sum(
                m.apply(p, xx).astype(jnp.float32)), bp, x)
        leg(f"{tag} full block (shift=3)",
            lambda p, xx, m=blk_s: jnp.sum(
                m.apply(p, xx).astype(jnp.float32)), bp, x)

        # pieces
        import flax.linen as nn

        ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
        lp = jax.device_put(ln.init(jax.random.PRNGKey(0), x), dev)
        leg(f"{tag} layernorm x1",
            lambda p, xx, m=ln: jnp.sum(m.apply(p, xx).astype(jnp.float32)),
            lp, x)
        leg(f"{tag} roll+unroll",
            lambda xx: jnp.sum(
                jnp.roll(jnp.roll(xx, (-3, -3), (1, 2)), (3, 3), (1, 2))
                .astype(jnp.float32)), x)
        leg(f"{tag} partition+reverse",
            lambda xx, hh=Hs, ww=Ws: jnp.sum(
                window_reverse(
                    window_partition(xx, ws), ws, hh, ww
                ).astype(jnp.float32)), x)

        # MXU floor: the 4 projections as plain matmuls on (B*H*W, C)
        w_qkv = jax.device_put(
            jnp.asarray(rng.randn(C, 3 * C).astype(np.float32))
            .astype(jnp.bfloat16), dev)
        w_proj = jax.device_put(
            jnp.asarray(rng.randn(C, C).astype(np.float32))
            .astype(jnp.bfloat16), dev)
        w_fc1 = jax.device_put(
            jnp.asarray(rng.randn(C, 4 * C).astype(np.float32))
            .astype(jnp.bfloat16), dev)
        w_fc2 = jax.device_put(
            jnp.asarray(rng.randn(4 * C, C).astype(np.float32))
            .astype(jnp.bfloat16), dev)

        def mats(xx, a, b, cc, d):
            t = xx.reshape(-1, xx.shape[-1])
            y = t @ a
            o = t @ b
            m = jax.nn.gelu(t @ cc, approximate=False) @ d
            return (jnp.sum(y.astype(jnp.float32))
                    + jnp.sum(o.astype(jnp.float32))
                    + jnp.sum(m.astype(jnp.float32)))

        leg(f"{tag} qkv+proj+mlp matmuls", mats, x, w_qkv, w_proj, w_fc1,
            w_fc2)

        # attention op alone on the packed windows layout
        nWB = BATCH * (Hs // ws) * (Ws // ws)
        qkv = jax.device_put(
            jnp.asarray(rng.randn(nWB, ws * ws, 3 * C).astype(np.float32))
            .astype(jnp.bfloat16), dev)
        bias = jax.device_put(
            jnp.asarray(rng.randn(h, ws * ws, ws * ws).astype(np.float32)),
            dev)
        mask = jax.device_put(
            jnp.asarray(shifted_window_mask(Hs, Ws, ws, 3)), dev)
        grp = 8 if h <= 12 else 2
        leg(f"{tag} fused attention (no mask)",
            lambda q, b, hh=h, g=grp: jnp.sum(
                fused_window_attention(q, b, None, hh, g)
                .astype(jnp.float32)), qkv, bias)
        leg(f"{tag} fused attention (masked)",
            lambda q, b, m, hh=h, g=grp: jnp.sum(
                fused_window_attention(q, b, m, hh, g)
                .astype(jnp.float32)), qkv, bias, mask)

    print(json.dumps({"profile_swin_micro_ms": rows}), flush=True)


if __name__ == "__main__":
    main()
