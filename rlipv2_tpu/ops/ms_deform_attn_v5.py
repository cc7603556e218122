"""v5 Pallas TPU kernel for multi-scale deformable attention: sub-slab
level splitting + locality-preserving query strips.

The v4 kernel's measured bound (SURVEY §6) is set by the padded dot
width: every one-hot matmul contracts over the level's padded width
Wpad, and at the flagship eval shape level 0 pads 168 -> 256 lanes while
levels 1-3 sit at the 128-lane floor. v5 removes the level-0 overhang:

  * every level wider than 128 columns is split into 128-lane sub-slabs
    anchored every 127 columns (so any bilinear corner pair (ix, ix+1)
    lives entirely inside one slab); each sample point is routed to
    exactly one sub-slab by masking its column weights, so the math is
    exact for arbitrary (global / out-of-bounds) sampling;
  * queries that form the level-0 pixel grid (encoder self-attention,
    Q == S) are permuted into column strips (strip_w columns, row-major
    inside the strip, each strip padded to the query block) so that a
    256-query block spans ~strip_w columns — with local sampling
    offsets, all its level-0 samples then fall into ONE sub-slab;
  * the per-(block, sub-level) window count from the v4 scalar-prefetch
    plan becomes 0 when no sample in the block carries weight for that
    sub-slab, and the kernel skips the whole sub-level (mixer build AND
    dot sweep) under a single `pl.when` region per sub-level.

Net effect at 832x1344: level-0 sampling from level-0 query blocks (the
majority of all (block, level) work) contracts over 128 lanes instead of
256, and dead sub-slabs cost one predicated region instead of a matmul.
Decoder-style calls (Q != S) skip the permutation and keep v4-equivalent
cost. The backward stays the v4 Pallas kernel (both forwards are exact,
so the shared VJP is valid for either).

MEASURED OUTCOME (on-chip A/B, tools/profile_msda_ab.py, flagship
encoder shape): v4 40.5 ms vs v5 58.7-59.7 ms across strip widths
32/64/96 — the XLA-side cost of the routed per-point expansion
(L*P 16->20) and the query-axis permutation gathers exceeds the <=20%
dot/mixer saving available above the 128-lane floor. v5 therefore stays
an OPT-IN variant (`msda_impl=pallas_v5`) documenting that the 2-D
tiling lever has been built, verified exact, and measured unprofitable;
v4 remains the default. See SURVEY.md §6.

Reference for behavior parity: the CUDA op this replaces is
models/ops/src/cuda/ms_deform_attn_cuda.cu (reference repo); numerics
oracle is `_ms_deform_attn_xla`.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rlipv2_tpu.ops.ms_deform_attn_v4 import _round_up

LANE = 128
SUB_STRIDE = 127  # sub-slab s owns ix in [127*s, 127*s + 126]


def _n_sub(w: int) -> int:
    if w <= LANE:
        return 1
    # cover every ix with nonzero weight: ix = w - 1 is a valid left
    # corner (x0 <= W-1 is in-bounds with wx0 > 0 when x lands exactly
    # on the last column), so the slabs must own ix in [0, w-1]. Using
    # ceil((w-1)/127) under-covered w ≡ 1 (mod 127) widths (e.g. 255):
    # ix = w-1 belonged to no slab and its sample was silently zeroed.
    return -(-w // SUB_STRIDE)


def _sub_plan(shapes, wsy):
    """Static expanded plan: one entry per (level, sub-slab).

    Entry: (src, base, h, ws, multi_y). Every slab is LANE columns wide
    (zero-padded past the level's real width)."""
    plan = []
    for src, (h, w) in enumerate(shapes):
        for s in range(_n_sub(w)):
            if h <= wsy:
                plan.append((src, s * SUB_STRIDE, h, h, False))
            else:
                plan.append((src, s * SUB_STRIDE, h, wsy, True))
    return tuple(plan)


@functools.lru_cache(maxsize=32)
def _grid_perm(shapes, qb, strip_w):
    """Column-strip query permutation for grid queries (Q == S).

    Returns (perm, inv) as numpy int32 arrays, or None when no level is
    wide enough to split. perm has length Qp2 (a multiple of qb) and
    maps kernel slot -> original query index, with Q as the dummy-pad
    index; inv maps original query -> kernel slot."""
    Q = sum(h * w for h, w in shapes)
    chunks = []
    rest = []
    off = 0
    any_strip = False
    for (h, w) in shapes:
        idx = off + np.arange(h * w, dtype=np.int32).reshape(h, w)
        if w > LANE:
            any_strip = True
            for c0 in range(0, w, strip_w):
                blk = idx[:, c0 : c0 + strip_w].reshape(-1)
                chunks.append(blk)
                pad = (-len(blk)) % qb
                if pad:
                    chunks.append(np.full((pad,), Q, np.int32))
        else:
            rest.append(idx.reshape(-1))
        off += h * w
    if not any_strip:
        return None
    if rest:
        r = np.concatenate(rest)
        chunks.append(r)
        pad = (-len(r)) % qb
        if pad:
            chunks.append(np.full((pad,), Q, np.int32))
    perm = np.concatenate(chunks)
    inv = np.empty((Q,), np.int32)
    real = perm < Q
    inv[perm[real]] = np.nonzero(real)[0].astype(np.int32)
    return perm, inv


def _window_info_v5(iy, wsum, plan, P, qb):
    """Per-(bh, sub-level, qblock) window anchor + count.

    Points whose column weights are both zero (routed to another
    sub-slab, OOB, or dummy padding) are excluded from the min/max so a
    partially-dead block still gets a tight y-window range; a block with
    no live point at all gets count 0 and the kernel skips the sub-level
    entirely."""
    BH, LP, Qp = iy.shape
    Ls = LP // P
    nqb = Qp // qb
    g = iy.reshape(BH, Ls, P, nqb, qb)
    live = wsum.reshape(BH, Ls, P, nqb, qb) > 0
    big = jnp.int32(1 << 20)
    mn = jnp.min(jnp.where(live, g, big), axis=(2, 4))
    mx = jnp.max(jnp.where(live, g, -big), axis=(2, 4))
    ws = jnp.asarray([p[3] for p in plan], jnp.int32)[None, :, None]
    multi = jnp.asarray([p[4] for p in plan], jnp.bool_)[None, :, None]
    alive = jnp.any(live, axis=(2, 4))
    mn = jnp.where(alive, mn, 0)
    mx = jnp.where(alive, mx, 0)
    n_win = jnp.maximum((mx + 1 - mn) // ws + 1, 1)
    n_win = jnp.where(multi, n_win, 1)
    n_win = jnp.where(alive, n_win, 0)
    return mn.astype(jnp.int32), n_win.astype(jnp.int32)


def _v5_kernel(
    min_ref, nwin_ref,
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    plan, qb, dim, n_points,
):
    Ls = len(plan)
    vrefs = refs[:Ls]
    out_ref = refs[Ls]
    acc_ref = refs[Ls + 1]  # (D, qb) f32 scratch

    b = pl.program_id(0)
    q = pl.program_id(1)
    acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    for e, (src, base, h_l, ws, multi) in enumerate(plan):
        v_ref = vrefs[e]
        vdtype = v_ref.dtype
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (LANE, qb), 0)
        iota_y = jax.lax.broadcasted_iota(jnp.int32, (ws, qb), 0)

        if not multi:
            iys, wy0s, wy1s, cxs = [], [], [], []
            for p in range(n_points):
                lp = e * n_points + p
                iy_p = iy_ref[0, lp, :][None, :]
                ix_p = ix_ref[0, lp, :][None, :]
                cx = (
                    wx0_ref[0, lp, :][None, :] * (iota_w == ix_p)
                    + wx1_ref[0, lp, :][None, :] * (iota_w == ix_p + 1)
                )
                cxs.append(cx.astype(vdtype))
                iys.append(iy_p)
                wy0s.append(wy0_ref[0, lp, :][None, :])
                wy1s.append(wy1_ref[0, lp, :][None, :])
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

        min_iy = min_ref[b, e, q]
        n_win = nwin_ref[b, e, q]

        def live(e=e, h_l=h_l, ws=ws, v_ref=v_ref, vdtype=vdtype,
                 iota_w=iota_w, iota_y=iota_y, min_iy=min_iy, n_win=n_win):
            iys, wy0s, wy1s, cxs = [], [], [], []
            for p in range(n_points):
                lp = e * n_points + p
                iy_p = iy_ref[0, lp, :][None, :]
                ix_p = ix_ref[0, lp, :][None, :]
                cx = (
                    wx0_ref[0, lp, :][None, :] * (iota_w == ix_p)
                    + wx1_ref[0, lp, :][None, :] * (iota_w == ix_p + 1)
                )
                cxs.append(cx.astype(vdtype))
                iys.append(iy_p)
                wy0s.append(wy0_ref[0, lp, :][None, :])
                wy1s.append(wy1_ref[0, lp, :][None, :])

            def window(k, carry):
                s_k = jnp.clip(min_iy + k * ws, 0, h_l - ws)
                rows = iota_y + s_k
                start = pl.multiple_of(s_k * dim, dim)
                v_yw = v_ref[0, pl.ds(start, ws * dim), :]
                acc_exp = jnp.zeros((ws, dim, qb), jnp.float32)
                for p in range(n_points):
                    t = jnp.dot(
                        v_yw, cxs[p], preferred_element_type=jnp.float32
                    )
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

        pl.when(n_win > 0)(live)

    out_ref[0] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "query_block", "wsy", "strip_w"),
)
def ms_deform_attn_v5(
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
    strip_w: int = 64,
) -> jnp.ndarray:
    """Returns (BH, Q, D) float32. Exact (same math as the XLA oracle)."""
    BH, Q, LP = iy.shape
    S, D = value.shape[1], value.shape[2]
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    L = len(shapes)
    P = LP // L
    plan = _sub_plan(shapes, wsy)
    Ls = len(plan)

    qb = min(query_block, max(_round_up(Q, 8), 8))

    # expand per-point arrays to sub-levels: route each sample to the
    # sub-slab owning its ix (zero weights + iy=-2 sentinel elsewhere)
    e_iy, e_ix, e_wy0, e_wy1, e_wx0, e_wx1 = [], [], [], [], [], []
    for (src, base, h, ws, multi) in plan:
        sl = slice(src * P, (src + 1) * P)
        iy_s = jnp.clip(iy[:, :, sl], -2, h)
        ix_s = ix[:, :, sl]
        wy0_s, wy1_s = wy0[:, :, sl], wy1[:, :, sl]
        wx0_s, wx1_s = wx0[:, :, sl], wx1[:, :, sl]
        if _n_sub(shapes[src][1]) > 1:
            # route by ix: weights zeroed outside this slab's owned
            # column range (window stats exclude zero-weight points)
            # slab 0 also owns ix < 0 (the ix+1 == 0 corner is valid)
            lo = base if base else -2
            m = (ix_s >= lo) & (ix_s <= base + (SUB_STRIDE - 1))
            wx0_s = wx0_s * m
            wx1_s = wx1_s * m
            ix_s = ix_s - base
        ix_s = jnp.clip(ix_s, -2, LANE)
        e_iy.append(iy_s)
        e_ix.append(ix_s)
        e_wy0.append(wy0_s)
        e_wy1.append(wy1_s)
        e_wx0.append(wx0_s)
        e_wx1.append(wx1_s)
    iy = jnp.concatenate(e_iy, axis=2)
    ix = jnp.concatenate(e_ix, axis=2)
    wy0 = jnp.concatenate(e_wy0, axis=2)
    wy1 = jnp.concatenate(e_wy1, axis=2)
    wx0 = jnp.concatenate(e_wx0, axis=2)
    wx1 = jnp.concatenate(e_wx1, axis=2)
    LPs = Ls * P

    pg = _grid_perm(shapes, qb, strip_w) if Q == S else None

    def prep(a, pad_val):
        # one trailing dummy query (the pad slot target), then permute
        a = jnp.pad(a, ((0, 0), (0, 1), (0, 0)), constant_values=pad_val)
        if pg is None:
            pad_q = (-Q) % qb
            idx = np.concatenate(
                [np.arange(Q, dtype=np.int32),
                 np.full((pad_q,), Q, np.int32)]
            )
        else:
            idx = pg[0]
        a = jnp.take(a, jnp.asarray(idx), axis=1)
        return jnp.swapaxes(a, 1, 2)  # (BH, LPs, Qp2)

    iy, ix = prep(iy, -2), prep(ix, -2)
    wy0, wy1 = prep(wy0, 0.0), prep(wy1, 0.0)
    wx0, wx1 = prep(wx0, 0.0), prep(wx1, 0.0)
    Qp2 = iy.shape[2]

    min_iy, n_win = _window_info_v5(iy, wx0 + wx1, plan, P, qb)

    # per-sub-slab transposed value views (BH, H*D, LANE)
    by_src = {}
    off = 0
    for src, (h, w) in enumerate(shapes):
        v = value[:, off : off + h * w].reshape(BH, h, w, D)
        v = jnp.transpose(v, (0, 1, 3, 2)).reshape(BH, h * D, w)
        wext = (_n_sub(w) - 1) * SUB_STRIDE + LANE
        if wext != w:
            v = jnp.pad(v, ((0, 0), (0, 0), (0, wext - w)))
        by_src[src] = v
        off += h * w
    vals = [
        jax.lax.slice_in_dim(by_src[src], base, base + LANE, axis=2)
        for (src, base, _, _, _) in plan
    ]

    scalar_spec = pl.BlockSpec(
        (1, LPs, qb), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
    )
    in_specs = [scalar_spec] * 6
    for v in vals:
        in_specs.append(
            pl.BlockSpec(
                (1, v.shape[1], v.shape[2]), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    flops = 2 * BH * Qp2 * sum(P * (ws * D) * 2 for (_, _, _, ws, _) in plan)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, Qp2 // qb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, D, qb), lambda b, q, *_: (b, 0, q), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((D, qb), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_v5_kernel, plan=plan, qb=qb, dim=D, n_points=P),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, D, Qp2), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(flops),
            bytes_accessed=BH * (S * D * 4 + Qp2 * LPs * 24 + Qp2 * D * 4),
            transcendentals=0,
        ),
    )(min_iy, n_win, iy, ix, wy0, wy1, wx0, wx1, *vals)

    out = jnp.swapaxes(out, 1, 2)  # (BH, Qp2, D)
    if pg is None:
        return out[:, :Q] if Qp2 != Q else out
    return jnp.take(out, jnp.asarray(pg[1]), axis=1)
