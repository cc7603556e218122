"""Pallas TPU kernel for multi-scale deformable attention.

Replaces the reference CUDA gather kernels
(models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238 forward, :302-846 six
backward variants) — but NOT by porting them: TPUs have no fast per-element
gather (XLA's gather lowering measures ~114 ms for the encoder's
self-attention shapes on v5e), so the kernel re-expresses bilinear sampling
as **separable one-hot contractions on the MXU**:

  sample(x, y) = sum_ij wy_i * wx_j * V[y_i, x_j]
               = C_x . ( R_y @ V_l )          (rows then columns)

Per grid step (one batch*head, one query block), for each level and
sampling point:
  1. the row mixer R (QB, H_l) = wy0*[iota==y0] + wy1*[iota==y0+1] is two
     VPU compare-accumulate passes over a tiny (QB, H_l) tile;
  2. tmp = R @ V_l with V_l laid out (H_l, W_l*D) — one MXU matmul that
     bilinearly blends entire feature ROWS;
  3. the column mixer C (QB, W_l*D) is built directly on the expanded
     lane axis via iota//D comparisons (no cross-lane reshapes, which
     Mosaic cannot relayout), with the softmaxed attention weight folded
     into wx;
  4. acc += (tmp * C) @ SEL, where SEL = tile(I_D) is a constant 0/1
     selector matmul that performs the strided x-sum on the MXU.

Measured ~10 ms for (B=4, S=Q≈6.8k, 8 heads, D=32, L=4, P=4) on v5e —
~11x over XLA's gather and ~7x over a dense one-hot (QB, S_l) formulation
(the K=16 accumulation passes over the full token axis are VPU-bandwidth
bound; the separable form does 2 passes over H_l + 2 over W_l*D instead).

Out-of-bounds handling (grid_sample zero padding) is free: OOB rows/cols
get zero wy/wx on the host side, and negative indices simply never match
the iota comparisons.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _separable_kernel(
    iy_ref, ix_ref, wy0_ref, wy1_ref, wx0_ref, wx1_ref, *refs,
    shapes, qb, dim, n_points,
):
    L = len(shapes)
    vrefs = refs[:L]
    srefs = refs[L : 2 * L]
    out_ref = refs[2 * L]
    acc = jnp.zeros((qb, dim), jnp.float32)
    for lvl in range(L):
        h_l, w_l = shapes[lvl]
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (qb, h_l), 1)
        iota_xd = jax.lax.broadcasted_iota(jnp.int32, (qb, w_l * dim), 1) // dim
        v_l = vrefs[lvl][0]  # (H_l, W_l*D)
        sel = srefs[lvl][:]  # (W_l*D, D)
        # accumulate the P points' column-mixed rows in the expanded space,
        # then run ONE selector matmul per level (saves (P-1)/P of the SEL
        # MXU work; measured ~26% op speedup at 832x1344 scale)
        acc_exp = jnp.zeros((qb, w_l * dim), jnp.float32)
        for p in range(n_points):
            lp = lvl * n_points + p
            iy_k = iy_ref[0, :, lp][:, None]
            ix_k = ix_ref[0, :, lp][:, None]
            r = wy0_ref[0, :, lp][:, None] * (iota_h == iy_k) + wy1_ref[
                0, :, lp
            ][:, None] * (iota_h == iy_k + 1)
            c = wx0_ref[0, :, lp][:, None] * (iota_xd == ix_k) + wx1_ref[
                0, :, lp
            ][:, None] * (iota_xd == ix_k + 1)
            tmp = jnp.dot(
                r.astype(v_l.dtype), v_l, preferred_element_type=jnp.float32
            )
            acc_exp = acc_exp + tmp * c
        acc = acc + jnp.dot(
            acc_exp.astype(sel.dtype), sel, preferred_element_type=jnp.float32
        )
    out_ref[0] = acc


@functools.partial(
    jax.jit, static_argnames=("spatial_shapes", "query_block")
)
def ms_deform_attn_separable(
    iy: jnp.ndarray,  # (BH, Q, L*P) int32 floor row indices
    ix: jnp.ndarray,  # (BH, Q, L*P) int32 floor col indices
    wy0: jnp.ndarray,  # (BH, Q, L*P) f32 row weights (0 when OOB)
    wy1: jnp.ndarray,
    wx0: jnp.ndarray,  # (BH, Q, L*P) f32 col weights * attention (0 when OOB)
    wx1: jnp.ndarray,
    value: jnp.ndarray,  # (BH, S, D) level-flattened (row-major per level)
    spatial_shapes: Sequence[tuple[int, int]],
    query_block: int = 128,
) -> jnp.ndarray:
    """Returns (BH, Q, D) float32."""
    BH, Q, LP = iy.shape
    S, D = value.shape[1], value.shape[2]
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    L = len(shapes)
    P = LP // L

    qb = min(query_block, Q)
    pad_q = (-Q) % qb
    if pad_q:
        pads = ((0, 0), (0, pad_q), (0, 0))
        iy, ix = jnp.pad(iy, pads, constant_values=-10), jnp.pad(ix, pads, constant_values=-10)
        wy0, wy1 = jnp.pad(wy0, pads), jnp.pad(wy1, pads)
        wx0, wx1 = jnp.pad(wx0, pads), jnp.pad(wx1, pads)
    Qp = Q + pad_q

    # per-level value views (BH, H_l, W_l*D): zero-copy reshapes of slices
    vals = []
    off = 0
    for h, w in shapes:
        vals.append(value[:, off : off + h * w].reshape(BH, h, w * D))
        off += h * w
    # constant column selectors (W_l*D, D)
    sels = [
        jnp.asarray(np.tile(np.eye(D, dtype=np.float32), (w, 1)))
        for _, w in shapes
    ]

    scalar_spec = pl.BlockSpec(
        (1, qb, LP), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
    )
    in_specs = [scalar_spec] * 6
    for h, w in shapes:
        in_specs.append(
            pl.BlockSpec((1, h, w * D), lambda b, q: (b, 0, 0), memory_space=pltpu.VMEM)
        )
    for _, w in shapes:
        in_specs.append(
            pl.BlockSpec((w * D, D), lambda b, q: (0, 0), memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        functools.partial(
            _separable_kernel, shapes=shapes, qb=qb, dim=D, n_points=P
        ),
        grid=(BH, Qp // qb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, qb, D), lambda b, q: (b, q, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, Qp, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * Qp * P * sum(h * w * D + w * D * D for h, w in shapes),
            bytes_accessed=BH * (S * D * 4 + Qp * LP * 24 + Qp * D * 4),
            transcendentals=0,
        ),
    )(iy, ix, wy0, wy1, wx0, wx1, *vals, *sels)
    return out[:, :Q] if pad_q else out
