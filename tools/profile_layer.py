"""Per-op timing at encoder shapes: v3 MSDA with realistic local offsets
vs random, FFN matmuls, QKV projections. Run: python -u tools/profile_layer.py
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

    from rlipv2_tpu.models.deformable import encoder_reference_points
    from rlipv2_tpu.ops import ms_deform_attn

    B, H, W = 8, 832, 1344
    shapes = []
    h, w = H // 8, W // 8
    for _ in range(4):
        shapes.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    shapes = tuple(shapes)
    N = sum(h * w for h, w in shapes)
    D, heads, P, L = 256, 8, 4, 4
    rng = np.random.RandomState(0)

    value = jnp.asarray(rng.randn(B, N, heads, D // heads), jnp.bfloat16)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(B, N, heads, L * P), jnp.float32)
    ).reshape(B, N, heads, L, P)

    # realistic: per-query reference point + offsets up to ~2 cells
    ref = encoder_reference_points(shapes, jnp.ones((B, L, 2), jnp.float32))
    # ref: (B, N, L, 2) normalized
    wh = jnp.asarray([[w, h] for (h, w) in shapes], jnp.float32)  # (L, 2)
    off = jnp.asarray(rng.randn(B, N, heads, L, P, 2).astype(np.float32))
    loc_real = ref[:, :, None, :, None, :] + off * 2.0 / wh[None, None, None, :, None, :]
    loc_rand = jnp.asarray(rng.rand(B, N, heads, L, P, 2).astype(np.float32))

    for name, loc in (("local", loc_real), ("random", loc_rand)):
        f = jax.jit(
            lambda v_, l_, a_: jnp.sum(
                ms_deform_attn(v_, shapes, l_, a_, impl="pallas").astype(
                    jnp.float32
                )
            )
        )
        t = marginal_time(f, value, loc, attn)
        print(f"msda v3 {name:7s}: {t*1000:7.1f} ms  (x6 = {t*6000:.0f})",
              flush=True)

    # FFN: two matmuls 256->1024->256 over (B*N) tokens
    x = jnp.asarray(rng.randn(B * N, 256), jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(256, 1024) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(1024, 256) * 0.02, jnp.bfloat16)
    ffn = jax.jit(
        lambda x_, a_, b_: jnp.sum(
            (jax.nn.relu(x_ @ a_) @ b_).astype(jnp.float32)
        )
    )
    t = marginal_time(ffn, x, w1, w2)
    print(f"ffn 256-1024-256: {t*1000:7.1f} ms  (x6 = {t*6000:.0f})", flush=True)

    # sampling-offset + attention-weight projections: 256 -> H*L*P*3 = 384
    wo = jnp.asarray(rng.randn(256, 384) * 0.02, jnp.bfloat16)
    proj = jax.jit(lambda x_, w_: jnp.sum((x_ @ w_).astype(jnp.float32)))
    t = marginal_time(proj, x, wo)
    print(f"offset/attn proj: {t*1000:7.1f} ms", flush=True)

    # value + output projections 256->256 x2
    wv = jnp.asarray(rng.randn(256, 256) * 0.02, jnp.bfloat16)
    t = marginal_time(proj, x, wv)
    print(f"value proj 256x256: {t*1000:7.1f} ms  (x2 x6 = {t*12000:.0f})",
          flush=True)


if __name__ == "__main__":
    main()
