"""Per-level cost split of the v4 MSDA backward kernel (round 4).

ms_deform_attn_v4_bwd launches one pallas_call per level; each call sweeps
the FULL (BH, Qp/qb) grid with its own per-point VPU mask builds, so small
levels may pay a flat floor unrelated to their pixel count. This times the
backward with only level-l's pallas_call enabled (others' outputs zeroed)
by calling the internal per-level loop on truncated plans.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_bwd_levels.py
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH = 8


def marginal_time(f, *args, n=6):
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

    from rlipv2_tpu.ops.ms_deform_attn import _separable_prepare
    from rlipv2_tpu.ops.ms_deform_attn_v4 import ms_deform_attn_v4_bwd

    rng = np.random.RandomState(0)
    shapes = ((104, 168), (52, 84), (26, 42), (13, 21))
    S = sum(h * w for h, w in shapes)
    nh, D, L, P = 8, 32, 4, 4

    value = jnp.asarray(rng.randn(BATCH, S, nh, D).astype(np.float32)).astype(
        jnp.bfloat16
    )
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
    off_px = rng.uniform(-3.0, 3.0, (BATCH, S, nh, L, P, 2)).astype(np.float32)
    loc = jnp.asarray(
        refs_np[None, :, None, None, None, :] + off_px / wh[:, None, :]
    ).astype(jnp.bfloat16)
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(BATCH, S, nh, L * P).astype(np.float32))
    ).reshape(BATCH, S, nh, L, P).astype(jnp.bfloat16)
    dout = jnp.asarray(rng.randn(BATCH, S, nh * D).astype(np.float32))

    iy, ix, wy0, wy1, wx0, wx1 = jax.jit(
        lambda l, a: _separable_prepare(shapes, l, a)
    )(loc, attn)
    v_t = jnp.swapaxes(value, 1, 2).reshape(BATCH * nh, S, D)
    g_t = jnp.swapaxes(
        dout.reshape(BATCH, S, nh, D).astype(jnp.bfloat16), 1, 2
    ).reshape(BATCH * nh, S, D)
    dev = jax.devices()[0]
    iy, ix, wy0, wy1, wx0, wx1, v_t, g_t = jax.device_put(
        (iy, ix, wy0, wy1, wx0, wx1, v_t, g_t), dev
    )

    rows = {}

    def tsum(t):
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), t, 0.0
        )

    def leg(name, f, *args, n=6):
        dt = marginal_time(f, *args, n=n) * 1000.0
        rows[name] = round(dt, 1)
        print(f"{name:<30} {dt:9.1f} ms", flush=True)
        return dt

    # full backward (all 4 levels)
    leg("bwd all levels", jax.jit(
        lambda *a: tsum(ms_deform_attn_v4_bwd(*a, spatial_shapes=shapes))
    ), iy, ix, wy0, wy1, wx0, wx1, v_t, g_t)

    # fused single-call backward (all levels, one grid sweep)
    for wsy in (4, 8):
        leg(f"bwd fused wsy={wsy}", jax.jit(
            lambda *a, s=wsy: tsum(ms_deform_attn_v4_bwd(
                *a, spatial_shapes=shapes, wsy=s, fused=True))
        ), iy, ix, wy0, wy1, wx0, wx1, v_t, g_t)

    # A/B: concatenated-dots wide kernel x window-row sizes
    for wide in (False, True):
        for wsy in (4, 8, 16):
            leg(f"bwd wide={int(wide)} wsy={wsy}", jax.jit(
                lambda *a, w=wide, s=wsy: tsum(ms_deform_attn_v4_bwd(
                    *a, spatial_shapes=shapes, wsy=s, wide=w, fused=False))
            ), iy, ix, wy0, wy1, wx0, wx1, v_t, g_t)

    # cumulative prefixes: levels[:k] only — the per-level marginal is
    # cum_k - cum_{k-1}. Point slots beyond level k are sliced off; value
    # rows beyond the prefix are sliced off.
    prev = 0.0
    off = 0
    for k in range(1, 5):
        sub_shapes = shapes[:k]
        off = sum(h * w for h, w in sub_shapes)
        sl = slice(0, k * P)

        def bwd_k(iy_, ix_, a0, a1, b0, b1, v_, g_, ss=sub_shapes, o=off, s=sl):
            return tsum(ms_deform_attn_v4_bwd(
                iy_[:, :, s], ix_[:, :, s], a0[:, :, s], a1[:, :, s],
                b0[:, :, s], b1[:, :, s], v_[:, :o], g_,
                spatial_shapes=ss,
            ))

        t = leg(f"bwd levels 1..{k}", jax.jit(bwd_k),
                iy, ix, wy0, wy1, wx0, wx1, v_t, g_t)
        rows[f"bwd level {k} marginal"] = round(t - prev, 1)
        prev = t

    print(json.dumps({"profile_bwd_levels_ms": rows}), flush=True)


if __name__ == "__main__":
    main()
