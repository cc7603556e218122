"""MSDA backward decomposition: kernel vs XLA glue (round 4).

The train profile (tools/profile_train.py) attributes 442 ms of the
~1050 ms fwd+bwd step to the MSDA backward; the op-level grad costs
50.1 ms/layer. This script splits ONE op backward at the flagship
encoder shape (832x1344 bs8, local offsets) into:

  kernel only          ms_deform_attn_v4_bwd on pre-prepped tensors
  prep fwd             _separable_prepare alone
  prep vjp chain       jax.vjp of the weight outputs wrt (loc, attn)
  layout glue          value transpose/reshape + dout relayout + dvalue
                       inverse transpose (measured as full - pieces)
  full op grad         jax.grad of ms_deform_attn (the in-model path)

Run (single-client TPU tunnel):
    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_msda_bwd.py
"""

from __future__ import annotations

import json
import time

import numpy as np

BATCH, H, W = 8, 832, 1344


def marginal_time(f, *args, n=6):
    """Relay-safe marginal timing (see bench.py): legs must return a
    SCALAR; block_until_ready is not a true sync through the axon relay,
    so queue-depth differencing brackets with a scalar fetch."""
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

    from rlipv2_tpu.ops.ms_deform_attn import (
        _separable_prepare,
        ms_deform_attn,
    )
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
    dev = jax.devices()[0]
    value, loc, attn = jax.device_put((value, loc, attn), dev)
    dout = jax.device_put(
        jnp.asarray(rng.randn(BATCH, S, nh * D).astype(np.float32)).astype(
            jnp.bfloat16
        ),
        dev,
    )

    rows = {}

    def leg(name, f, *args, n=6):
        dt = marginal_time(f, *args, n=n) * 1000.0
        rows[name] = round(dt, 1)
        print(f"{name:<26} {dt:9.1f} ms", flush=True)
        return dt

    # full op grad (the in-model path)
    def op_loss(v, l, a):
        return jnp.sum(
            ms_deform_attn(v, shapes, l, a, impl="pallas").astype(jnp.float32)
        )

    def tsum(t):
        import jax as _j
        return _j.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), t, 0.0
        )

    t_full_fb = leg("full op fwd+grad", jax.jit(
        lambda v, l, a: tsum(jax.grad(op_loss, argnums=(0, 1, 2))(v, l, a))
    ), value, loc, attn)
    t_fwd = leg("op fwd only", jax.jit(op_loss), value, loc, attn)
    rows["op bwd-only"] = round(t_full_fb - t_fwd, 1)

    # prep fwd alone
    leg("prep fwd", jax.jit(
        lambda l, a: tsum(_separable_prepare(shapes, l, a))
    ), loc, attn)

    # prep vjp chain: cotangents of the four weight outputs -> (dloc, dattn)
    iy, ix, wy0, wy1, wx0, wx1 = jax.jit(
        lambda l, a: _separable_prepare(shapes, l, a)
    )(loc, attn)
    g4 = (wy0 + 1.0, wy1 + 1.0, wx0 + 1.0, wx1 + 1.0)

    def chain(l, a, gs):
        def w_only(l_, a_):
            _, _, a0, a1, b0, b1 = _separable_prepare(shapes, l_, a_)
            return a0, a1, b0, b1

        _, vjp = jax.vjp(w_only, l, a)
        return tsum(vjp(gs))

    leg("prep vjp chain", jax.jit(chain), loc, attn, g4)

    # kernel only, on pre-prepped tensors (includes the per-level value
    # transpose + dv inverse glue that lives inside ms_deform_attn_v4_bwd)
    v_t = jnp.swapaxes(value, 1, 2).reshape(BATCH * nh, S, D)
    g_t = jnp.swapaxes(dout.reshape(BATCH, S, nh, D), 1, 2).reshape(
        BATCH * nh, S, D
    )

    leg("v4_bwd kernel+glue", jax.jit(
        lambda *a: tsum(ms_deform_attn_v4_bwd(*a, spatial_shapes=shapes))
    ), iy, ix, wy0, wy1, wx0, wx1, v_t, g_t)

    print(json.dumps({"profile_msda_bwd_ms": rows}), flush=True)


if __name__ == "__main__":
    main()
