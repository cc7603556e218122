"""A/B timing of the v4 MSDA kernel at encoder model shapes (832x1344
bs8, 4 levels, 8 heads, D=32), with realistic LOCAL sampling offsets
(radial-grid init scale) — sweeps query_block x wsy and the int8 variant.
Run: PYTHONPATH=.:$PYTHONPATH python -u tools/profile_msda_ab.py
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
    import functools

    import jax
    import jax.numpy as jnp

    # same persistent compile cache as bench.py: kernel compiles through
    # the axon tunnel cost minutes each on a cold cache
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from rlipv2_tpu.models.deformable import encoder_reference_points
    from rlipv2_tpu.ops.ms_deform_attn import _separable_prepare
    from rlipv2_tpu.ops.ms_deform_attn_v4 import (
        ms_deform_attn_v4,
        ms_deform_attn_v4_int8,
    )

    B, H, W = 8, 832, 1344
    Hh, D, L, P = 8, 32, 4, 4
    shapes = []
    h, w = H // 8, W // 8
    for _ in range(L):
        shapes.append((h, w))
        h, w = (h + 1) // 2, (w + 1) // 2
    shapes = tuple(shapes)
    S = sum(hh * ww for hh, ww in shapes)

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B * Hh, S, D).astype(np.float32)).astype(
        jnp.bfloat16
    )
    refs = encoder_reference_points(
        shapes, jnp.ones((B, L, 2), jnp.float32)
    )  # (B, S, L, 2)
    # local offsets at the radial-grid init scale (+-(p+1) px of the level)
    offs = rng.uniform(-1, 1, (B, S, Hh, L, P, 2)).astype(np.float32)
    offs *= np.arange(1, P + 1)[None, None, None, None, :, None]
    norm = np.asarray([[ww, hh] for hh, ww in shapes], np.float32)
    loc = np.asarray(refs)[:, :, None, :, None, :] + offs / norm[None, None, None, :, None, :]
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(B, S, Hh, L * P).astype(np.float32)), axis=-1
    ).reshape(B, S, Hh, L, P)

    iy, ix, wy0, wy1, wx0, wx1 = jax.jit(
        functools.partial(_separable_prepare, shapes)
    )(jnp.asarray(loc), attn)
    args = (iy, ix, wy0, wy1, wx0, wx1, value)

    import os

    qbs = tuple(
        int(x) for x in os.environ.get("AB_QB", "256,512").split(",")
    )
    wsys = tuple(
        int(x) for x in os.environ.get("AB_WSY", "8,16").split(",")
    )
    for qb in qbs:
        for wsy in wsys:
            try:
                f = jax.jit(
                    lambda *a, qb=qb, wsy=wsy: jnp.sum(
                        ms_deform_attn_v4(
                            *a, spatial_shapes=shapes, query_block=qb,
                            wsy=wsy,
                        )
                    )
                )
                dt = marginal_time(f, *args)
                print(f"v4 fwd qb={qb} wsy={wsy}: {dt*1000:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"v4 fwd qb={qb} wsy={wsy}: FAILED {type(e).__name__}: {e}",
                      flush=True)

    f8 = jax.jit(
        lambda *a: jnp.sum(
            ms_deform_attn_v4_int8(*a, spatial_shapes=shapes)
        )
    )
    dt = marginal_time(f8, *args)
    print(f"v4 int8 qb=256 wsy=8: {dt*1000:7.2f} ms", flush=True)

    from rlipv2_tpu.ops.ms_deform_attn_v5 import ms_deform_attn_v5

    for qb in qbs:
        for wsy in wsys:
            for sw in (
                int(x)
                for x in os.environ.get("AB_STRIP", "32,64,96").split(",")
            ):
                try:
                    f5 = jax.jit(
                        lambda *a, qb=qb, wsy=wsy, sw=sw: jnp.sum(
                            ms_deform_attn_v5(
                                *a, spatial_shapes=shapes, query_block=qb,
                                wsy=wsy, strip_w=sw,
                            )
                        )
                    )
                    dt = marginal_time(f5, *args)
                    print(
                        f"v5 fwd qb={qb} wsy={wsy} strip={sw}: "
                        f"{dt*1000:7.2f} ms",
                        flush=True,
                    )
                except Exception as e:
                    print(
                        f"v5 fwd qb={qb} wsy={wsy} strip={sw}: FAILED "
                        f"{type(e).__name__}: {e}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
