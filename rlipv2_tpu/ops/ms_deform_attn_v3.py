"""Transposed-layout Pallas TPU kernel for multi-scale deformable attention
("v3"): dynamic y-windows on sublanes, branch-free fast path.

Design (third iteration; see ms_deform_attn_pallas.py for the dense
separable kernel. A second iteration — 2-D query tiles + static column
windows skipped per-window with `pl.when` — measured SLOWER than dense
(165 vs 145 ms at 832x1344 bs8) because `pl.when` region overhead on TPU
(~hundreds of cycles per region, ~40 regions/step) exceeded the saved MXU
passes; this design keeps the branch count near zero on the fast path):

  * each level's values are stored TRANSPOSED as (H_l*D, W_pad): the y
    and channel axes share the SUBLANE dimension, x lives on lanes padded
    to 128. Lanes can never be sliced dynamically on TPU, but x is now
    densely packed (W <= 256 for every level at 1333 px), so full-width
    matmuls cost only cdiv(W_pad, 128) K-passes — locality on x is not
    needed at all, which also removes any need to reorder queries;
  * y locality IS exploited, with zero branches: the kernel reads one
    dynamic sublane window V_yw = V[ds(s*D, WS*D), :] per level anchored
    at s = clip(min_y0, 0, H-WS) — for row-major encoder query blocks the
    whole block samples a handful of adjacent rows, so one window usually
    covers every sample of the level;
  * per point, the x-gather+blend is ONE one-hot matmul
    T = V_yw @ Cx_p with Cx_p (W_pad, qb) carrying wx*attn weights
    (M = WS*D/128 tiles, K = W_pad/128, N = 1 — e.g. 4 passes for the
    104x168 level at WS=8);
  * the y bilinear blend is an elementwise sublane mask (built at (WS, qb)
    and broadcast over D), and the y-fold is a sublane-group reduction
    (reshape (WS, D, qb) -> sum axis 0) — pure VPU, no selector matmul,
    exact in f32;
  * samples outside the first window are covered by additional windows
    k = 1.. under `pl.when(min_y0 + k*WS <= max_y0 + 1)` — conservative
    per-level range check, so arbitrary (even global) sampling locations
    stay EXACT; far samples only cost extra windows. Disjoint bucket
    masks (floor(y - min_y0) // WS == k) prevent double counting when
    clamped windows overlap.

The backward re-uses the same structure: the value scatter is the
transposed one-hot matmul Cx_p @ (masked dtmp) accumulated into the
(H*D, W_pad) layout (replacing the reference's six atomics-based CUDA
kernels, ms_deform_im2col_cuda.cuh:302-846), and the weight gradients are
masked sublane reductions.
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
    """Per-level static plan: (H, W, Wpad, window_rows, n_cover)."""
    plan = []
    for h, w in shapes:
        wpad = _round_up(w, 128)
        if h <= wsy:
            plan.append((h, w, wpad, h, 1))
        else:
            # clipped rows span [-2, h]; +1 for the y0+1 corner
            n_cover = -(-(h + 4) // wsy) + 1
            plan.append((h, w, wpad, wsy, n_cover))
    return tuple(plan)


def _v3_kernel(
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    plan, qb, dim, n_points,
):
    L = len(plan)
    vrefs = refs[:L]
    out_ref = refs[L]
    acc_ref = refs[L + 1]  # (D, qb) f32 scratch

    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    for lvl, (h_l, w_l, wpad, ws, n_cover) in enumerate(plan):
        v_ref = vrefs[lvl]
        vdtype = v_ref.dtype
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, qb), 0)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, qb), 0)

        # hoisted per-point lane vectors + x one-hot mixers
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
        iy_lvl = iy_ref[0, lvl * n_points : (lvl + 1) * n_points, :]
        min_iy = jnp.min(iy_lvl)
        max_iy = jnp.max(iy_lvl)

        def window(k, lvl=lvl, h_l=h_l, ws=ws, n_cover=n_cover,
                   v_ref=v_ref, iys=iys, wy0s=wy0s, wy1s=wy1s, cxs=cxs,
                   iota_y=iota_y, min_iy=min_iy):
            if n_cover == 1:
                s_k = 0
                rows = iota_y  # absolute row ids 0..h-1
            else:
                s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
                rows = iota_y + s_k
            v_yw = v_ref[0, pl.ds(s_k * dim, ws * dim), :] if n_cover > 1 \
                else v_ref[0, : ws * dim, :]
            acc_exp = jnp.zeros((ws, dim, qb), jnp.float32)
            for p in range(n_points):
                t = jnp.dot(
                    v_yw, cxs[p], preferred_element_type=jnp.float32
                )  # (ws*D, qb)
                m = wy0s[p] * (rows == iys[p]) + wy1s[p] * (
                    rows == iys[p] + 1
                )  # (ws, qb)
                if n_cover > 1:
                    # disjoint buckets relative to min_y0 dedupe overlap
                    # from clamped windows (see module docstring)
                    rel0 = iys[p] - min_iy
                    rel1 = rel0 + 1
                    b0 = (rel0 >= k * ws) & (rel0 < (k + 1) * ws)
                    b1 = (rel1 >= k * ws) & (rel1 < (k + 1) * ws)
                    m = wy0s[p] * (rows == iys[p]) * b0 + wy1s[p] * (
                        rows == iys[p] + 1
                    ) * b1
                acc_exp = acc_exp + t.reshape(ws, dim, qb) * m[:, None, :]
            # y-fold: sublane-group reduction, then (D, qb) accumulate
            acc_ref[:] += jnp.sum(acc_exp, axis=0)

        window(0)
        for k in range(1, plan[lvl][4]):
            @pl.when(min_iy + k * ws <= max_iy + 1)
            def _(k=k):
                window(k)

    out_ref[0] = acc_ref[:]


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "query_block", "wsy")
)
def ms_deform_attn_transposed(
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

    # clip indices into [-2, H] / [-2, W]: semantics-preserving (weights of
    # clipped corners are already zero) and bounds the window count
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
        (1, LP, qb), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM
    )
    in_specs = [scalar_spec] * 6
    for v in vals:
        in_specs.append(
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    flops = 2 * BH * Qp * sum(
        P * (ws * D) * (wpad / 128.0) * 2 for (_, _, wpad, ws, _) in plan
    )
    out = pl.pallas_call(
        functools.partial(
            _v3_kernel, plan=plan, qb=qb, dim=D, n_points=P
        ),
        grid=(BH, Qp // qb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, D, qb), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, D, Qp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, qb), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=BH * (S * D * 4 + Qp * LP * 24 + Qp * D * 4),
            transcendentals=0,
        ),
    )(iy, ix, wy0, wy1, wx0, wx1, *vals)

    out = jnp.swapaxes(out, 1, 2)  # (BH, Qp, D)
    return out[:, :Q] if pad_q else out


def _v3_bwd_kernel(
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    plan, qb, dim, n_points,
):
    """Backward: value scatter = transposed one-hot matmuls into the
    (H*D, Wpad) layout (replacing the reference's six atomics-based CUDA
    kernels, ms_deform_im2col_cuda.cuh:302-846); weight grads = masked
    sublane reductions. Same dynamic-window structure as the forward."""
    L = len(plan)
    vrefs = refs[:L]
    dout_ref = refs[L]  # (1, D, qb) f32
    dvrefs = refs[L + 1 : 2 * L + 1]
    gouts = refs[2 * L + 1 : 2 * L + 5]  # gy0, gy1, gx0, gx1 (1, LP, qb)
    gscr = refs[2 * L + 5 : 2 * L + 9]  # scratch (LP, qb) f32

    q = pl.program_id(1)
    LP = n_points * L

    @pl.when(q == 0)
    def _():
        for lvl in range(L):
            dvrefs[lvl][0] = jnp.zeros(dvrefs[lvl].shape[1:], jnp.float32)

    for g in gscr:
        g[:] = jnp.zeros((LP, qb), jnp.float32)

    dout = dout_ref[0].astype(jnp.float32)  # (D, qb)

    for lvl, (h_l, w_l, wpad, ws, n_cover) in enumerate(plan):
        v_ref = vrefs[lvl]
        dv_ref = dvrefs[lvl]
        vdtype = v_ref.dtype
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (wpad, qb), 0)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, qb), 0)
        dexp = jnp.broadcast_to(dout[None], (ws, dim, qb))  # (ws, D, qb)

        iys, wy0s, wy1s, cxs, mx0s, mx1s = [], [], [], [], [], []
        for p in range(n_points):
            lp = lvl * n_points + p
            iy_p = iy_ref[0, lp, :][None, :]
            ix_p = ix_ref[0, lp, :][None, :]
            m0 = (iota_w == ix_p)
            m1 = (iota_w == ix_p + 1)
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
        iy_lvl = iy_ref[0, lvl * n_points : (lvl + 1) * n_points, :]
        min_iy = jnp.min(iy_lvl)
        max_iy = jnp.max(iy_lvl)

        def window(k, lvl=lvl, h_l=h_l, ws=ws, n_cover=n_cover,
                   v_ref=v_ref, dv_ref=dv_ref, min_iy=min_iy,
                   iys=iys, wy0s=wy0s, wy1s=wy1s, cxs=cxs,
                   mx0s=mx0s, mx1s=mx1s, iota_y=iota_y, dexp=dexp):
            if n_cover == 1:
                row_slice = slice(0, ws * dim)
                rows = iota_y
            else:
                s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
                start = pl.multiple_of(s_k * dim, dim)
                row_slice = pl.ds(start, ws * dim)
                rows = iota_y + s_k
            v_yw = v_ref[0, row_slice, :]  # (ws*D, Wpad)
            dv_acc = jnp.zeros((ws * dim, v_yw.shape[-1]), jnp.float32)
            for p in range(n_points):
                lp = lvl * n_points + p
                e0 = (rows == iys[p])
                e1 = (rows == iys[p] + 1)
                if n_cover > 1:
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
                t = jnp.dot(
                    v_yw, cxs[p], preferred_element_type=jnp.float32
                )  # (ws*D, qb)
                dm = jnp.sum(
                    (t.reshape(ws, dim, qb) * dexp), axis=1
                )  # (ws, qb)
                gscr[0][lp, :] += jnp.sum(dm * e0, axis=0)
                gscr[1][lp, :] += jnp.sum(dm * e1, axis=0)
                dcx = jax.lax.dot_general(
                    v_yw,
                    dt.astype(vdtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (Wpad, qb)
                gscr[2][lp, :] += jnp.sum(dcx * mx0s[p], axis=0)
                gscr[3][lp, :] += jnp.sum(dcx * mx1s[p], axis=0)
            dv_ref[0, row_slice, :] += dv_acc

        window(0)
        for k in range(1, plan[lvl][4]):
            @pl.when(min_iy + k * ws <= max_iy + 1)
            def _(k=k):
                window(k)

    for g_out, g_s in zip(gouts, gscr):
        g_out[0] = g_s[:]


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "query_block", "wsy")
)
def ms_deform_attn_transposed_bwd(
    iy, ix, wy0, wy1, wx0, wx1, value, dout,
    spatial_shapes,
    query_block: int = 256,
    wsy: int = 8,
):
    """Backward pass of ms_deform_attn_transposed: returns
    (dwy0, dwy1, dwx0, dwx1, dvalue) in the forward input layouts."""
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
    # dout (BH, Q, D) -> (BH, D, Qp)
    if pad_q:
        dout = jnp.pad(dout.astype(jnp.float32), ((0, 0), (0, pad_q), (0, 0)))
    else:
        dout = dout.astype(jnp.float32)
    dout = jnp.swapaxes(dout, 1, 2)

    # ONE pallas_call per level: the backward is level-separable, and a
    # single call holding every level's f32 dv buffer in VMEM overflows
    # the ~16 MB budget at 832x1344 (measured: 16.4 MB requested)
    dvalue_pieces = []
    g_pieces = []  # per level (gy0, gy1, gx0, gx1) slices
    off = 0
    for lvl, (h, w, wpad, ws, n_cover) in enumerate(plan):
        v = value[:, off : off + h * w].reshape(BH, h, w, D)
        v = jnp.transpose(v, (0, 1, 3, 2)).reshape(BH, h * D, w)
        if wpad != w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wpad - w)))
        off += h * w

        sl = slice(lvl * P, (lvl + 1) * P)
        scalar_spec = pl.BlockSpec(
            (1, P, qb), lambda b, q: (b, 0, q), memory_space=pltpu.VMEM
        )
        in_specs = [scalar_spec] * 6 + [
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, D, qb), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((BH, v.shape[1], v.shape[2]), jnp.float32)
        ] + [jax.ShapeDtypeStruct((BH, P, Qp), jnp.float32)] * 4
        out_specs = [
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ] + [
            pl.BlockSpec((1, P, qb), lambda b, q: (b, 0, q),
                         memory_space=pltpu.VMEM)
        ] * 4

        outs = pl.pallas_call(
            functools.partial(
                _v3_bwd_kernel,
                plan=(plan[lvl],),
                qb=qb,
                dim=D,
                n_points=P,
            ),
            grid=(BH, Qp // qb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((P, qb), jnp.float32)] * 4,
            cost_estimate=pl.CostEstimate(
                flops=int(6 * BH * Qp * P * (ws * D) * (wpad / 128.0) * 2),
                bytes_accessed=BH * (
                    2 * h * w * D * 8 + Qp * P * 24 + Qp * D * 4
                ),
                transcendentals=0,
            ),
        )(
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
