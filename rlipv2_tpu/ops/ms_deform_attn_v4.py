"""v4 Pallas TPU kernel for multi-scale deformable attention.

Evolution of the v3 design (ms_deform_attn_v3.py — transposed (H*D, W_pad)
value layout, dynamic y-windows on sublanes). v3 measured ~40 ms at
832x1344 bs8 regardless of tile shape — i.e. NOT matmul-bound. The two
dominant overheads were:

  * in-kernel cross-lane `jnp.min/max` reductions over the (P, qb) index
    block (2 per level per program = 8 slow lane-reductions per block);
  * the window-coverage chain `pl.when(min_iy + k*ws <= max_iy + 1)` for
    k = 1..n_cover — up to ~26 guarded regions per block at 832x1344,
    each costing hundreds of cycles even when the predicate is false.

v4 removes both:

  * the per-(bh, level, qblock) window anchor `min_iy` and the EXACT
    dynamic window count `n_win = (max_iy + 1 - min_iy) // ws + 1` are
    computed OUTSIDE the kernel (two tiny XLA reductions over the already
    materialized index tensor) and handed to the kernel through scalar
    prefetch (SMEM), so the kernel body contains no lane reductions;
  * the window sweep is one `jax.lax.fori_loop(0, n_win)` with a dynamic
    trip count — on the fast path (local sampling, one window) the body
    runs exactly once and there are ZERO conditional regions.

Everything else keeps the v3 math: per point an x one-hot mixer
Cx_p (W_pad, qb) carrying wx*attn, one MXU matmul T = V_yw @ Cx_p per
point per window, y bilinear blend as a sublane mask, disjoint bucket
masks for multi-window exactness (arbitrary/global sampling stays exact,
far samples just cost extra loop iterations).

The backward keeps the same structure (value scatter = transposed one-hot
matmul, weight grads = masked sublane reductions; replaces the six
atomics-based CUDA scatter kernels of the reference,
models/ops/src/cuda/ms_deform_im2col_cuda.cuh:302-846) and gets the same
scalar-prefetch + fori_loop treatment.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def _plan(shapes, wsy):
    """Per-level static plan: (H, W, Wpad, window_rows, multi_window)."""
    plan = []
    for h, w in shapes:
        wpad = _round_up(w, 128)
        if h <= wsy:
            plan.append((h, w, wpad, h, False))
        else:
            plan.append((h, w, wpad, wsy, True))
    return tuple(plan)


def _window_info(iy, plan, P, qb):
    """XLA-side per-(bh, level, qblock) window anchors and counts.

    iy: (BH, LP, Qp) clipped floor row indices (padding queries carry -2,
    which only ever SHRINKS the window range because real local samples
    dominate; a fully padded block still gets n_win >= 1 and computes
    zeros). Returns (min_iy, n_win) each (BH, L, nQB) int32.
    """
    BH, LP, Qp = iy.shape
    L = LP // P
    nqb = Qp // qb
    g = iy.reshape(BH, L, P, nqb, qb)
    mn = jnp.min(g, axis=(2, 4))  # (BH, L, nQB)
    mx = jnp.max(g, axis=(2, 4))
    ws = jnp.asarray([p[3] for p in plan], jnp.int32)[None, :, None]
    multi = jnp.asarray([p[4] for p in plan], jnp.bool_)[None, :, None]
    n_win = jnp.maximum((mx + 1 - mn) // ws + 1, 1)
    n_win = jnp.where(multi, n_win, 1)
    return mn.astype(jnp.int32), n_win.astype(jnp.int32)


def _v4_kernel(
    min_ref, nwin_ref,  # scalar prefetch: (BH, L, nQB) int32
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    plan, qb, dim, n_points,
):
    L = len(plan)
    vrefs = refs[:L]
    out_ref = refs[L]
    acc_ref = refs[L + 1]  # (D, qb) f32 scratch

    b = pl.program_id(0)
    q = pl.program_id(1)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    for lvl, (h_l, w_l, wpad, ws, multi) in enumerate(plan):
        v_ref = vrefs[lvl]
        vdtype = v_ref.dtype
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, qb), 0)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, qb), 0)

        # hoisted per-point lane vectors + x one-hot mixers (shared
        # across windows)
        iys, wy0s, wy1s, cxs = [], [], [], []
        for p in range(n_points):
            lp = lvl * n_points + p
            iy_p = iy_ref[0, lp, :][None, :]  # (1, qb)
            ix_p = ix_ref[0, lp, :][None, :]
            cx = (
                wx0_ref[0, lp, :][None, :] * (iota_w == ix_p)
                + wx1_ref[0, lp, :][None, :] * (iota_w == ix_p + 1)
            )
            cxs.append(cx.astype(vdtype))
            iys.append(iy_p)
            wy0s.append(wy0_ref[0, lp, :][None, :])
            wy1s.append(wy1_ref[0, lp, :][None, :])

        if not multi:
            # level fits in one static window: absolute rows, no buckets
            v_yw = v_ref[0, : ws * dim, :]
            acc_exp = jnp.zeros((ws, dim, qb), jnp.float32)
            for p in range(n_points):
                t = jnp.dot(v_yw, cxs[p], preferred_element_type=jnp.float32)
                m = wy0s[p] * (iota_y == iys[p]) + wy1s[p] * (
                    iota_y == iys[p] + 1
                )
                acc_exp = acc_exp + t.reshape(ws, dim, qb) * m[:, None, :]
            acc_ref[:] += jnp.sum(acc_exp, axis=0)
            continue

        min_iy = min_ref[b, lvl, q]
        n_win = nwin_ref[b, lvl, q]

        def window(k, carry, lvl=lvl, h_l=h_l, ws=ws, v_ref=v_ref,
                   iys=iys, wy0s=wy0s, wy1s=wy1s, cxs=cxs,
                   iota_y=iota_y, min_iy=min_iy):
            s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
            rows = iota_y + s_k
            start = pl.multiple_of(s_k * dim, dim)
            v_yw = v_ref[0, pl.ds(start, ws * dim), :]
            acc_exp = jnp.zeros((ws, dim, qb), jnp.float32)
            for p in range(n_points):
                t = jnp.dot(v_yw, cxs[p], preferred_element_type=jnp.float32)
                # disjoint buckets relative to min_iy dedupe overlap from
                # clamped windows
                rel0 = iys[p] - min_iy
                rel1 = rel0 + 1
                b0 = (rel0 >= k * ws) & (rel0 < (k + 1) * ws)
                b1 = (rel1 >= k * ws) & (rel1 < (k + 1) * ws)
                m = wy0s[p] * ((rows == iys[p]) & b0) + wy1s[p] * (
                    (rows == iys[p] + 1) & b1
                )
                acc_exp = acc_exp + t.reshape(ws, dim, qb) * m[:, None, :]
            acc_ref[:] += jnp.sum(acc_exp, axis=0)
            return carry

        jax.lax.fori_loop(0, n_win, window, 0)

    out_ref[0] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "query_block", "wsy")
)
def ms_deform_attn_v4(
    iy: jnp.ndarray,  # (BH, Q, L*P) int32 floor row indices
    ix: jnp.ndarray,
    wy0: jnp.ndarray,  # (BH, Q, L*P) f32 row weights (0 when OOB)
    wy1: jnp.ndarray,
    wx0: jnp.ndarray,  # (BH, Q, L*P) f32 col weights * attention
    wx1: jnp.ndarray,
    value: jnp.ndarray,  # (BH, S, D) level-flattened row-major
    spatial_shapes: Sequence[tuple[int, int]],
    query_block: int = 256,
    wsy: int = 8,
) -> jnp.ndarray:
    """Returns (BH, Q, D) float32."""
    BH, Q, LP = iy.shape
    S, D = value.shape[1], value.shape[2]
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    L = len(shapes)
    P = LP // L
    plan = _plan(shapes, wsy)

    qb = min(query_block, max(_round_up(Q, 8), 8))
    pad_q = (-Q) % qb
    Qp = Q + pad_q

    # clip indices into [-2, H] / [-2, W]: semantics-preserving (weights
    # of clipped corners are already zero) and bounds the window count
    h_arr = np.zeros((LP,), np.int32)
    w_arr = np.zeros((LP,), np.int32)
    for lvl, (h, w) in enumerate(shapes):
        h_arr[lvl * P : (lvl + 1) * P] = h
        w_arr[lvl * P : (lvl + 1) * P] = w
    iy = jnp.clip(iy, -2, jnp.asarray(h_arr)[None, None, :])
    ix = jnp.clip(ix, -2, jnp.asarray(w_arr)[None, None, :])

    def prep(a, pad_val):
        if pad_q:
            a = jnp.pad(
                a, ((0, 0), (0, pad_q), (0, 0)), constant_values=pad_val
            )
        return jnp.swapaxes(a, 1, 2)  # (BH, LP, Qp)

    iy, ix = prep(iy, -2), prep(ix, -2)
    wy0, wy1 = prep(wy0, 0.0), prep(wy1, 0.0)
    wx0, wx1 = prep(wx0, 0.0), prep(wx1, 0.0)

    min_iy, n_win = _window_info(iy, plan, P, qb)

    # per-level transposed value views (BH, H*D, Wpad)
    vals = []
    off = 0
    for (h, w, wpad, _, _) in plan:
        v = value[:, off : off + h * w].reshape(BH, h, w, D)
        v = jnp.transpose(v, (0, 1, 3, 2)).reshape(BH, h * D, w)
        if wpad != w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wpad - w)))
        vals.append(v)
        off += h * w

    scalar_spec = pl.BlockSpec(
        (1, LP, qb), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
    )
    in_specs = [scalar_spec] * 6
    for v in vals:
        in_specs.append(
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    flops = 2 * BH * Qp * sum(
        P * (ws * D) * (wpad / 128.0) * 2 for (_, _, wpad, ws, _) in plan
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, Qp // qb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, D, qb), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((D, qb), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_v4_kernel, plan=plan, qb=qb, dim=D, n_points=P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, D, Qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=BH * (S * D * 4 + Qp * LP * 24 + Qp * D * 4),
            transcendentals=0,
        ),
    )(min_iy, n_win, iy, ix, wy0, wy1, wx0, wx1, *vals)

    out = jnp.swapaxes(out, 1, 2)  # (BH, Qp, D)
    return out[:, :Q] if pad_q else out


def _v4_bwd_kernel(
    min_ref, nwin_ref,
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    plan, qb, dim, n_points,
):
    """Backward for ONE level (the caller splits levels across
    pallas_calls to bound VMEM): value scatter = transposed one-hot
    matmuls into the (H*D, Wpad) layout; weight grads = masked sublane
    reductions. Scalar-prefetched windows, dynamic fori_loop sweep."""
    (h_l, w_l, wpad, ws, multi) = plan[0]
    v_ref = refs[0]
    dout_ref = refs[1]  # (1, D, qb) f32
    dv_ref = refs[2]
    gouts = refs[3:7]  # gy0, gy1, gx0, gx1 (1, P, qb)
    gscr = refs[7:11]  # scratch (P, qb) f32

    b = pl.program_id(0)
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        dv_ref[0] = jnp.zeros(dv_ref.shape[1:], jnp.float32)

    for g in gscr:
        g[:] = jnp.zeros((n_points, qb), jnp.float32)

    dout = dout_ref[0].astype(jnp.float32)  # (D, qb)
    vdtype = v_ref.dtype
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, qb), 0)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, qb), 0)
    dexp = jnp.broadcast_to(dout[None], (ws, dim, qb))  # (ws, D, qb)

    iys, wy0s, wy1s, cxs, mx0s, mx1s = [], [], [], [], [], []
    for p in range(n_points):
        iy_p = iy_ref[0, p, :][None, :]
        ix_p = ix_ref[0, p, :][None, :]
        m0 = iota_w == ix_p
        m1 = iota_w == ix_p + 1
        cx = (
            wx0_ref[0, p, :][None, :] * m0
            + wx1_ref[0, p, :][None, :] * m1
        )
        cxs.append(cx.astype(vdtype))
        mx0s.append(m0)
        mx1s.append(m1)
        iys.append(iy_p)
        wy0s.append(wy0_ref[0, p, :][None, :])
        wy1s.append(wy1_ref[0, p, :][None, :])

    min_iy = min_ref[b, 0, q]
    n_win = nwin_ref[b, 0, q]

    def window(k, carry):
        if multi:
            s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
            start = pl.multiple_of(s_k * dim, dim)
            row_slice = pl.ds(start, ws * dim)
            rows = iota_y + s_k
        else:
            row_slice = slice(0, ws * dim)
            rows = iota_y
        v_yw = v_ref[0, row_slice, :]  # (ws*D, Wpad)
        dv_acc = jnp.zeros((ws * dim, wpad), jnp.float32)
        for p in range(n_points):
            e0 = rows == iys[p]
            e1 = rows == iys[p] + 1
            if multi:
                rel0 = iys[p] - min_iy
                b0 = (rel0 >= k * ws) & (rel0 < (k + 1) * ws)
                b1 = (rel0 + 1 >= k * ws) & (rel0 + 1 < (k + 1) * ws)
                e0 = e0 & b0
                e1 = e1 & b1
            m = wy0s[p] * e0 + wy1s[p] * e1  # (ws, qb)
            dt = (dexp * m[:, None, :]).reshape(ws * dim, qb)
            # value grad: dt @ Cx^T
            dv_acc = dv_acc + jax.lax.dot_general(
                dt.astype(vdtype),
                cxs[p],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # weight grads
            t = jnp.dot(v_yw, cxs[p], preferred_element_type=jnp.float32)
            dm = jnp.sum(t.reshape(ws, dim, qb) * dexp, axis=1)  # (ws, qb)
            gscr[0][p, :] += jnp.sum(dm * e0, axis=0)
            gscr[1][p, :] += jnp.sum(dm * e1, axis=0)
            dcx = jax.lax.dot_general(
                v_yw,
                dt.astype(vdtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Wpad, qb)
            gscr[2][p, :] += jnp.sum(dcx * mx0s[p], axis=0)
            gscr[3][p, :] += jnp.sum(dcx * mx1s[p], axis=0)
        dv_ref[0, row_slice, :] += dv_acc
        return carry

    if multi:
        jax.lax.fori_loop(0, n_win, window, 0)
    else:
        window(0, 0)

    for g_out, g_s in zip(gouts, gscr):
        g_out[0] = g_s[:]


def _v4_bwd_kernel_wide(
    min_ref, nwin_ref,
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    plan, qb, dim, n_points,
):
    """Wide variant of _v4_bwd_kernel: the P per-point lane vectors are
    flattened onto ONE (P*qb)-lane axis, so each window body runs THREE
    large dots (K or N = P*qb) instead of 3*P small ones, and every mask /
    mixer build happens once at full width. Same math, same outputs.

    MEASURED: at the flagship encoder shape with realistic LOCAL offsets
    (tools/profile_bwd_levels.py, round 4) this is 85-95 ms vs 79.6 ms for
    the per-point per-level path — the bwd is bound by the per-point VPU
    expansion area, which widening re-arranges but does not shrink, and
    the wide masks/builds at (ws, P*qb) cost the same element ops. (An
    earlier uniform-random-offset measurement suggested ~1.9x; random
    offsets inflate window counts ~3x and overweight per-window fixed
    costs.) Kept opt-in (wide=True) as the documented A/B baseline."""
    (h_l, w_l, wpad, ws, multi) = plan[0]
    v_ref = refs[0]
    dout_ref = refs[1]  # (1, D, qb) f32
    dv_ref = refs[2]
    gouts = refs[3:7]  # gy0, gy1, gx0, gx1 (1, P, qb)
    gscr = refs[7:11]  # scratch (P, qb) f32

    b = pl.program_id(0)
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        dv_ref[0] = jnp.zeros(dv_ref.shape[1:], jnp.float32)

    P = n_points
    Qw = P * qb
    dout = dout_ref[0].astype(jnp.float32)  # (D, qb)
    vdtype = v_ref.dtype

    # (1, P*qb) wide lane vectors; lane index = p*qb + q. Built by lane
    # concat (Mosaic rejects sublane->lane shape casts like (P,qb)->(1,Qw))
    def widen(ref):
        return jnp.concatenate(
            [ref[0, p : p + 1, :] for p in range(P)], axis=1
        )

    iy_w = widen(iy_ref)
    ix_w = widen(ix_ref)
    wy0_w = widen(wy0_ref)
    wy1_w = widen(wy1_ref)
    wx0_w = widen(wx0_ref)
    wx1_w = widen(wx1_ref)

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, Qw), 0)
    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, Qw), 0)

    mx0 = iota_w == ix_w
    mx1 = iota_w == ix_w + 1
    cx_w = (wx0_w * mx0 + wx1_w * mx1).astype(vdtype)  # (wpad, Qw)

    # dout tiled P times along lanes: DW[d, p*qb + q] = dout[d, q]
    dout_w = jnp.concatenate([dout] * P, axis=1)  # (D, Qw)
    dexp_w = jnp.broadcast_to(dout_w[None], (ws, dim, Qw))

    for g in gscr:
        g[:] = jnp.zeros((P, qb), jnp.float32)

    min_iy = min_ref[b, 0, q]
    n_win = nwin_ref[b, 0, q]

    def window(k, carry):
        if multi:
            s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
            start = pl.multiple_of(s_k * dim, dim)
            row_slice = pl.ds(start, ws * dim)
            rows = iota_y + s_k
        else:
            row_slice = slice(0, ws * dim)
            rows = iota_y
        v_yw = v_ref[0, row_slice, :]  # (ws*D, wpad)

        e0 = rows == iy_w
        e1 = rows == iy_w + 1
        if multi:
            rel0 = iy_w - min_iy
            b0 = (rel0 >= k * ws) & (rel0 < (k + 1) * ws)
            b1 = (rel0 + 1 >= k * ws) & (rel0 + 1 < (k + 1) * ws)
            e0 = e0 & b0
            e1 = e1 & b1
        m = wy0_w * e0 + wy1_w * e1  # (ws, Qw)
        dt = (dexp_w * m[:, None, :]).reshape(ws * dim, Qw).astype(vdtype)

        # value grad: ONE dot, contraction over the wide axis
        dv_ref[0, row_slice, :] += jax.lax.dot_general(
            dt, cx_w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # weight grads
        t = jnp.dot(v_yw, cx_w, preferred_element_type=jnp.float32)
        dm = jnp.sum(t.reshape(ws, dim, Qw) * dexp_w, axis=1)  # (ws, Qw)
        dcx = jax.lax.dot_general(
            v_yw, dt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (wpad, Qw)
        sums = (
            jnp.sum(dm * e0, axis=0, keepdims=True),
            jnp.sum(dm * e1, axis=0, keepdims=True),
            jnp.sum(dcx * mx0, axis=0, keepdims=True),
            jnp.sum(dcx * mx1, axis=0, keepdims=True),
        )  # each (1, Qw)
        # un-widen by static lane slices (no sublane<->lane shape casts)
        for j, s in enumerate(sums):
            for p in range(P):
                gscr[j][p, :] += s[0, p * qb : (p + 1) * qb]
        return carry

    if multi:
        jax.lax.fori_loop(0, n_win, window, 0)
    else:
        window(0, 0)

    for g_out, g_s in zip(gouts, gscr):
        g_out[0] = g_s[:]


def _v4_bwd_kernel_fused(
    min_ref, nwin_ref,
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    plan, qb, dim, n_points,
):
    """ALL levels in ONE pallas_call (like the forward). The per-level
    backward split was the round-3 VMEM-safety choice; the hypothesis was
    that the 4 separate calls pay a per-grid-sweep floor (per-level
    marginals with realistic local offsets: 36.3 / 15.6 / 15.3 / 12.2 ms,
    tools/profile_bwd_levels.py) that one shared sweep would amortize.

    MEASURED (round 4, flagship encoder shape, local offsets): fused
    wsy=8 is 79.7 ms vs 79.6 ms for the per-level path — PARITY. The
    small-level floor is the per-point VPU expansion work (P masks/builds
    over (ws*D or wpad, qb) areas), which executes identically inside the
    fused body; only dispatch overhead is shared, and that is negligible.
    Every level's f32 dv buffer must live in VMEM at once (~4.9 MB at
    832x1344 — fits; the wrapper falls back to per-level calls above a
    VMEM estimate). Kept opt-in (fused=True) as the documented A/B
    baseline; the per-level path stays the default."""
    L = len(plan)
    P = n_points
    vrefs = refs[:L]
    dout_ref = refs[L]  # (1, D, qb) f32
    dv_refs = refs[L + 1 : 2 * L + 1]
    gouts = refs[2 * L + 1 : 2 * L + 5]  # (1, LP, qb)
    gscr = refs[2 * L + 5 : 2 * L + 9]  # (LP, qb) f32 scratch

    b = pl.program_id(0)
    q = pl.program_id(1)

    @pl.when(q == 0)
    def _():
        for dv_ref in dv_refs:
            dv_ref[0] = jnp.zeros(dv_ref.shape[1:], jnp.float32)

    for g in gscr:
        g[:] = jnp.zeros((L * P, qb), jnp.float32)

    dout = dout_ref[0].astype(jnp.float32)  # (D, qb)

    for lvl, (h_l, w_l, wpad, ws, multi) in enumerate(plan):
        v_ref = vrefs[lvl]
        dv_ref = dv_refs[lvl]
        vdtype = v_ref.dtype
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, qb), 0)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, qb), 0)
        dexp = jnp.broadcast_to(dout[None], (ws, dim, qb))

        iys, wy0s, wy1s, cxs, mx0s, mx1s = [], [], [], [], [], []
        for p in range(P):
            lp = lvl * P + p
            iy_p = iy_ref[0, lp, :][None, :]
            ix_p = ix_ref[0, lp, :][None, :]
            m0 = iota_w == ix_p
            m1 = iota_w == ix_p + 1
            cx = (
                wx0_ref[0, lp, :][None, :] * m0
                + wx1_ref[0, lp, :][None, :] * m1
            )
            cxs.append(cx.astype(vdtype))
            mx0s.append(m0)
            mx1s.append(m1)
            iys.append(iy_p)
            wy0s.append(wy0_ref[0, lp, :][None, :])
            wy1s.append(wy1_ref[0, lp, :][None, :])

        min_iy = min_ref[b, lvl, q]
        n_win = nwin_ref[b, lvl, q]

        def window(k, carry, lvl=lvl, h_l=h_l, ws=ws, multi=multi,
                   v_ref=v_ref, dv_ref=dv_ref, iys=iys, wy0s=wy0s,
                   wy1s=wy1s, cxs=cxs, mx0s=mx0s, mx1s=mx1s,
                   iota_y=iota_y, min_iy=min_iy, dexp=dexp):
            if multi:
                s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
                start = pl.multiple_of(s_k * dim, dim)
                row_slice = pl.ds(start, ws * dim)
                rows = iota_y + s_k
            else:
                row_slice = slice(0, ws * dim)
                rows = iota_y
            v_yw = v_ref[0, row_slice, :]
            dv_acc = jnp.zeros((ws * dim, wpad), jnp.float32)
            for p in range(P):
                lp = lvl * P + p
                e0 = rows == iys[p]
                e1 = rows == iys[p] + 1
                if multi:
                    rel0 = iys[p] - min_iy
                    b0 = (rel0 >= k * ws) & (rel0 < (k + 1) * ws)
                    b1 = (rel0 + 1 >= k * ws) & (rel0 + 1 < (k + 1) * ws)
                    e0 = e0 & b0
                    e1 = e1 & b1
                m = wy0s[p] * e0 + wy1s[p] * e1
                dt = (dexp * m[:, None, :]).reshape(ws * dim, qb)
                dv_acc = dv_acc + jax.lax.dot_general(
                    dt.astype(vdtype), cxs[p],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                t = jnp.dot(v_yw, cxs[p], preferred_element_type=jnp.float32)
                dm = jnp.sum(t.reshape(ws, dim, qb) * dexp, axis=1)
                gscr[0][lp, :] += jnp.sum(dm * e0, axis=0)
                gscr[1][lp, :] += jnp.sum(dm * e1, axis=0)
                dcx = jax.lax.dot_general(
                    v_yw, dt.astype(vdtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gscr[2][lp, :] += jnp.sum(dcx * mx0s[p], axis=0)
                gscr[3][lp, :] += jnp.sum(dcx * mx1s[p], axis=0)
            dv_ref[0, row_slice, :] += dv_acc
            return carry

        if multi:
            jax.lax.fori_loop(0, n_win, window, 0)
        else:
            window(0, 0)

    for g_out, g_s in zip(gouts, gscr):
        g_out[0] = g_s[:]


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "query_block", "wsy", "wide", "fused"),
)
def ms_deform_attn_v4_bwd(
    iy, ix, wy0, wy1, wx0, wx1, value, dout,
    spatial_shapes,
    query_block: int = 256,
    wsy: int = 8,
    wide: bool = False,
    fused: bool = False,
):
    """Backward pass of ms_deform_attn_v4: returns
    (dwy0, dwy1, dwx0, dwx1, dvalue) in the forward input layouts.

    Default: one pallas_call per level (the round-3 path). Two measured
    restructurings are kept opt-in for A/B (tools/profile_bwd_levels.py,
    round 4, realistic local offsets at the flagship encoder shape):
    fused=True runs all levels in one call (79.7 ms vs 79.6 — parity;
    falls back to per-level above a VMEM estimate), wide=True runs the
    concatenated-dots kernel (85-95 ms — slower). Conclusion: the bwd is
    bound by per-point VPU expansion area, like the forward's mixer; its
    ~80 ms at 832x1344 bs8 is the formulation's floor, not call overhead."""
    BH, Q, LP = iy.shape
    S, D = value.shape[1], value.shape[2]
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    L = len(shapes)
    P = LP // L
    plan = _plan(shapes, wsy)

    # fused path keeps every level's f32 dv buffer + value resident in
    # VMEM at once; fall back to per-level calls above ~11 MB. Decide
    # BEFORE padding: the fused call caps qb at 128 (qb=256 overflows the
    # 16 MB scoped-vmem limit by ~0.7 MB at 832x1344), and Qp must be a
    # multiple of whichever qb the kernel runs with (decoder Q=200 with a
    # post-hoc qb cap broke _window_info's (BH, L, P, Qp//qb, qb) reshape).
    vmem_est = sum(
        h * D * wpad * (4 + value.dtype.itemsize)
        for (h, _, wpad, _, _) in plan
    )
    use_fused = fused and vmem_est <= 11 * 1024 * 1024
    qb_cap = min(query_block, 128) if use_fused else query_block
    qb = min(qb_cap, max(_round_up(Q, 8), 8))
    pad_q = (-Q) % qb
    Qp = Q + pad_q

    h_arr = np.zeros((LP,), np.int32)
    w_arr = np.zeros((LP,), np.int32)
    for lvl, (h, w) in enumerate(shapes):
        h_arr[lvl * P : (lvl + 1) * P] = h
        w_arr[lvl * P : (lvl + 1) * P] = w
    iy = jnp.clip(iy, -2, jnp.asarray(h_arr)[None, None, :])
    ix = jnp.clip(ix, -2, jnp.asarray(w_arr)[None, None, :])

    def prep(a, pad_val):
        if pad_q:
            a = jnp.pad(
                a, ((0, 0), (0, pad_q), (0, 0)), constant_values=pad_val
            )
        return jnp.swapaxes(a, 1, 2)

    iy, ix = prep(iy, -2), prep(ix, -2)
    wy0, wy1 = prep(wy0, 0.0), prep(wy1, 0.0)
    wx0, wx1 = prep(wx0, 0.0), prep(wx1, 0.0)
    if pad_q:
        dout = jnp.pad(dout.astype(jnp.float32), ((0, 0), (0, pad_q), (0, 0)))
    else:
        dout = dout.astype(jnp.float32)
    dout = jnp.swapaxes(dout, 1, 2)

    min_all, nwin_all = _window_info(iy, plan, P, qb)

    # transposed (h*D, wpad) per-level value views (shared by both paths)
    vals = []
    off = 0
    for (h, w, wpad, _, _) in plan:
        v = value[:, off : off + h * w].reshape(BH, h, w, D)
        v = jnp.transpose(v, (0, 1, 3, 2)).reshape(BH, h * D, w)
        if wpad != w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wpad - w)))
        vals.append(v)
        off += h * w

    if use_fused:
        qb_f = qb
        min_f, nwin_f = min_all, nwin_all
        scalar_spec = pl.BlockSpec(
            (1, LP, qb_f), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
        )
        in_specs = [scalar_spec] * 6
        for v in vals:
            in_specs.append(
                pl.BlockSpec(
                    (1, v.shape[1], v.shape[2]), lambda b, q, *_: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        in_specs.append(
            pl.BlockSpec((1, D, qb_f), lambda b, q, *_: (b, 0, q),
                         memory_space=pltpu.VMEM)
        )
        out_shapes = [
            jax.ShapeDtypeStruct((BH, v.shape[1], v.shape[2]), jnp.float32)
            for v in vals
        ] + [jax.ShapeDtypeStruct((BH, LP, Qp), jnp.float32)] * 4
        out_specs = [
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for v in vals
        ] + [
            pl.BlockSpec((1, LP, qb_f), lambda b, q, *_: (b, 0, q),
                         memory_space=pltpu.VMEM)
        ] * 4
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BH, Qp // qb_f),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((LP, qb_f), jnp.float32)] * 4,
        )
        flops = 6 * BH * Qp * P * sum(
            (ws * D) * (wpad / 128.0) for (_, _, wpad, ws, _) in plan
        )
        outs = pl.pallas_call(
            functools.partial(
                _v4_bwd_kernel_fused, plan=plan, qb=qb_f, dim=D, n_points=P
            ),
            grid_spec=grid_spec,
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=int(flops),
                bytes_accessed=BH * (2 * S * D * 8 + Qp * LP * 24 + Qp * D * 4),
                transcendentals=0,
            ),
        )(min_f, nwin_f, iy, ix, wy0, wy1, wx0, wx1, *vals, dout)

        dvalue_pieces = []
        for lvl, (h, w, wpad, _, _) in enumerate(plan):
            dv = outs[lvl][:, :, :w].reshape(BH, h, D, w)
            dv = jnp.transpose(dv, (0, 1, 3, 2)).reshape(BH, h * w, D)
            dvalue_pieces.append(dv)
        dvalue = jnp.concatenate(dvalue_pieces, axis=1).astype(value.dtype)

        def unpack_f(i):
            g = jnp.swapaxes(outs[L + i], 1, 2)  # (BH, Qp, LP)
            return g[:, :Q] if pad_q else g

        return unpack_f(0), unpack_f(1), unpack_f(2), unpack_f(3), dvalue

    # per-level fallback: one pallas_call per level keeps only that
    # level's f32 dv buffer in VMEM
    dvalue_pieces = []
    g_pieces = []
    for lvl, (h, w, wpad, ws, multi) in enumerate(plan):
        v = vals[lvl]
        sl = slice(lvl * P, (lvl + 1) * P)
        scalar_spec = pl.BlockSpec(
            (1, P, qb), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
        )
        in_specs = [scalar_spec] * 6 + [
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, D, qb), lambda b, q, *_: (b, 0, q),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((BH, v.shape[1], v.shape[2]), jnp.float32)
        ] + [jax.ShapeDtypeStruct((BH, P, Qp), jnp.float32)] * 4
        out_specs = [
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] + [
            pl.BlockSpec((1, P, qb), lambda b, q, *_: (b, 0, q),
                         memory_space=pltpu.VMEM)
        ] * 4

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(BH, Qp // qb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((P, qb), jnp.float32)] * 4,
        )
        outs = pl.pallas_call(
            functools.partial(
                _v4_bwd_kernel_wide if wide else _v4_bwd_kernel,
                plan=(plan[lvl],), qb=qb, dim=D, n_points=P,
            ),
            grid_spec=grid_spec,
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=int(6 * BH * Qp * P * (ws * D) * (wpad / 128.0) * 2),
                bytes_accessed=BH * (
                    2 * h * w * D * 8 + Qp * P * 24 + Qp * D * 4
                ),
                transcendentals=0,
            ),
        )(
            min_all[:, lvl : lvl + 1], nwin_all[:, lvl : lvl + 1],
            iy[:, sl], ix[:, sl], wy0[:, sl], wy1[:, sl],
            wx0[:, sl], wx1[:, sl], v, dout,
        )
        dv = outs[0][:, :, :w].reshape(BH, h, D, w)
        dv = jnp.transpose(dv, (0, 1, 3, 2)).reshape(BH, h * w, D)
        dvalue_pieces.append(dv)
        g_pieces.append(outs[1:])

    dvalue = jnp.concatenate(dvalue_pieces, axis=1).astype(value.dtype)

    def unpack(i):
        g = jnp.concatenate([gp[i] for gp in g_pieces], axis=1)
        g = jnp.swapaxes(g, 1, 2)  # (BH, Qp, LP)
        return g[:, :Q] if pad_q else g

    return unpack(0), unpack(1), unpack(2), unpack(3), dvalue


def _v4_int8_kernel(
    min_ref, nwin_ref,
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, scale_ref, *refs,
    plan, qb, dim, n_points,
):
    """int8 fast-path forward: values pre-quantized to int8 per
    (bh, level, CHANNEL); the x one-hot mixer is quantized in-kernel to
    int8 with a fixed x127 scale (wx * attn <= 1 post-softmax). Dots run
    on the int8 MXU path (~1.5x bf16 at these shapes, measured); the y
    blend and accumulation stay f32, de-scaled per (level, channel) by
    scale_v / 127^2 folded into the per-level accumulate."""
    L = len(plan)
    vrefs = refs[:L]
    out_ref = refs[L]
    acc_ref = refs[L + 1]

    b = pl.program_id(0)
    q = pl.program_id(1)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    for lvl, (h_l, w_l, wpad, ws, multi) in enumerate(plan):
        v_ref = vrefs[lvl]
        # (D,) per-channel descale for this level
        descale = scale_ref[0, lvl] * (1.0 / (127.0 * 127.0))
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, qb), 0)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, qb), 0)

        iys, wy0s, wy1s, cxs = [], [], [], []
        for p in range(n_points):
            lp = lvl * n_points + p
            iy_p = iy_ref[0, lp, :][None, :]
            ix_p = ix_ref[0, lp, :][None, :]
            # per-COLUMN (query) mixer scale: attention weights are often
            # << 1, so a fixed x127 scale wastes most of the int8 range;
            # the column max folds into the y-mask multiply for free
            wx0_p = wx0_ref[0, lp, :][None, :]
            wx1_p = wx1_ref[0, lp, :][None, :]
            colmax = jnp.maximum(jnp.maximum(wx0_p, wx1_p), 1e-8)
            cx = (
                (wx0_p / colmax) * (iota_w == ix_p)
                + (wx1_p / colmax) * (iota_w == ix_p + 1)
            )
            cxs.append(jnp.round(cx * 127.0).astype(jnp.int8))
            iys.append(iy_p)
            wy0s.append(wy0_ref[0, lp, :][None, :] * colmax)
            wy1s.append(wy1_ref[0, lp, :][None, :] * colmax)

        if not multi:
            v_yw = v_ref[0, : ws * dim, :]
            acc_exp = jnp.zeros((ws, dim, qb), jnp.float32)
            for p in range(n_points):
                t = jax.lax.dot_general(
                    v_yw, cxs[p], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                m = wy0s[p] * (iota_y == iys[p]) + wy1s[p] * (
                    iota_y == iys[p] + 1
                )
                acc_exp = acc_exp + t.reshape(ws, dim, qb) * m[:, None, :]
            acc_ref[:] += jnp.sum(acc_exp, axis=0) * descale[:, None]
            continue

        min_iy = min_ref[b, lvl, q]
        n_win = nwin_ref[b, lvl, q]

        def window(k, carry, lvl=lvl, h_l=h_l, ws=ws, v_ref=v_ref,
                   iys=iys, wy0s=wy0s, wy1s=wy1s, cxs=cxs,
                   iota_y=iota_y, min_iy=min_iy, descale=descale):
            # noqa: descale closed over per level
            s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
            rows = iota_y + s_k
            start = pl.multiple_of(s_k * dim, dim)
            v_yw = v_ref[0, pl.ds(start, ws * dim), :]
            acc_exp = jnp.zeros((ws, dim, qb), jnp.float32)
            for p in range(n_points):
                t = jax.lax.dot_general(
                    v_yw, cxs[p], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                rel0 = iys[p] - min_iy
                rel1 = rel0 + 1
                b0 = (rel0 >= k * ws) & (rel0 < (k + 1) * ws)
                b1 = (rel1 >= k * ws) & (rel1 < (k + 1) * ws)
                m = wy0s[p] * ((rows == iys[p]) & b0) + wy1s[p] * (
                    (rows == iys[p] + 1) & b1
                )
                acc_exp = acc_exp + t.reshape(ws, dim, qb) * m[:, None, :]
            acc_ref[:] += jnp.sum(acc_exp, axis=0) * descale[:, None]
            return carry

        jax.lax.fori_loop(0, n_win, window, 0)

    out_ref[0] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "query_block", "wsy")
)
def ms_deform_attn_v4_int8(
    iy, ix, wy0, wy1, wx0, wx1, value, spatial_shapes,
    query_block: int = 256, wsy: int = 8,
):
    """int8 fast inference variant of ms_deform_attn_v4 (forward only):
    values are quantized per (bh, level) to int8 with a max-abs scale,
    the one-hot mixers to a fixed x127 scale. Relative output error is
    <~1%% — an OPT-IN speed mode, never the default. Returns (BH, Q, D)
    float32."""
    BH, Q, LP = iy.shape
    S, D = value.shape[1], value.shape[2]
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    L = len(shapes)
    P = LP // L
    plan = _plan(shapes, wsy)

    qb = min(query_block, max(_round_up(Q, 8), 8))
    pad_q = (-Q) % qb
    Qp = Q + pad_q

    h_arr = np.zeros((LP,), np.int32)
    w_arr = np.zeros((LP,), np.int32)
    for lvl, (h, w) in enumerate(shapes):
        h_arr[lvl * P : (lvl + 1) * P] = h
        w_arr[lvl * P : (lvl + 1) * P] = w
    iy = jnp.clip(iy, -2, jnp.asarray(h_arr)[None, None, :])
    ix = jnp.clip(ix, -2, jnp.asarray(w_arr)[None, None, :])

    def prep(a, pad_val):
        if pad_q:
            a = jnp.pad(
                a, ((0, 0), (0, pad_q), (0, 0)), constant_values=pad_val
            )
        return jnp.swapaxes(a, 1, 2)

    iy, ix = prep(iy, -2), prep(ix, -2)
    wy0, wy1 = prep(wy0, 0.0), prep(wy1, 0.0)
    wx0, wx1 = prep(wx0, 0.0), prep(wx1, 0.0)

    min_iy, n_win = _window_info(iy, plan, P, qb)

    # per-(bh, level, channel) max-abs scales + int8 transposed values
    vals = []
    scales = []
    off = 0
    vf = value.astype(jnp.float32)
    for (h, w, wpad, _, _) in plan:
        piece = vf[:, off : off + h * w]  # (BH, hw, D)
        s = jnp.maximum(
            jnp.max(jnp.abs(piece), axis=1), 1e-6
        )  # (BH, D)
        q8 = jnp.clip(
            jnp.round(piece * (127.0 / s[:, None, :])), -127, 127
        ).astype(jnp.int8)
        v = q8.reshape(BH, h, w, D)
        v = jnp.transpose(v, (0, 1, 3, 2)).reshape(BH, h * D, w)
        if wpad != w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wpad - w)))
        vals.append(v)
        scales.append(s)
        off += h * w
    scale_arr = jnp.stack(scales, axis=1)  # (BH, L, D) f32

    scalar_spec = pl.BlockSpec(
        (1, LP, qb), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
    )
    in_specs = [scalar_spec] * 6 + [
        pl.BlockSpec((1, L, D), lambda b, q, *_: (b, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    for v in vals:
        in_specs.append(
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, Qp // qb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, D, qb), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((D, qb), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _v4_int8_kernel, plan=plan, qb=qb, dim=D, n_points=P
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, D, Qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * BH * Qp * sum(
                P * (ws * D) * (wpad / 128.0) * 2
                for (_, _, wpad, ws, _) in plan
            )),
            bytes_accessed=BH * (S * D + Qp * LP * 24 + Qp * D * 4),
            transcendentals=0,
        ),
    )(min_iy, n_win, iy, ix, wy0, wy1, wx0, wx1, scale_arr, *vals)

    out = jnp.swapaxes(out, 1, 2)
    return out[:, :Q] if pad_q else out
