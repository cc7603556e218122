"""Multi-scale deformable attention — the hot op of every deformable model.

Capability parity with the reference CUDA extension
(`models/ops/src/cuda/ms_deform_im2col_cuda.cuh:238` forward,
six backward variants) and its pure-PyTorch oracle
`ms_deform_attn_core_pytorch` (models/ops/functions/ms_deform_attn_func.py:45-65).

TPU-first design notes
----------------------
The CUDA kernel is a per-thread gather + bilinear blend with atomic scatter
in the backward pass. On TPU we instead express the op as ONE fused XLA
gather over the level-flattened value tensor:

  * all `n_levels * n_points * 4` corner indices are computed vectorized
    (levels are a static axis — spatial shapes are compile-time constants,
    which also removes the reference's `level_start_index` device tensor);
  * a single `take_along_axis` gathers every corner for every query in one
    XLA gather HLO (good TPU gather tiling, no per-level kernel launches);
  * bilinear corner weights are fused with the softmaxed attention weights
    *before* the gather reduction, so the weighted reduce is one einsum-like
    contraction that XLA fuses with the gather;
  * the backward pass falls out of autodiff: the gather transposes to one
    scatter-add, replacing the reference's six hand-written atomics kernels.

Sampling semantics match `F.grid_sample(align_corners=False,
padding_mode="zeros")` applied at `2*loc - 1`: a normalized location
`loc ∈ [0,1]` samples pixel coordinates `(loc*W - 0.5, loc*H - 0.5)` and
out-of-bounds corners contribute zero.

`spatial_shapes` is a static tuple of (H, W) pairs, NOT a traced array —
level geometry is part of the compiled program (resolution bucketing keeps
the set of programs small).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

SpatialShapes = Sequence[tuple[int, int]]


def _level_sizes(spatial_shapes: SpatialShapes) -> tuple[tuple[int, ...], int]:
    sizes = tuple(int(h) * int(w) for h, w in spatial_shapes)
    return sizes, sum(sizes)


def _corner_indices_and_weights(
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,  # (B, Q, H, L, P, 2) in [0, 1]
    level_local: bool = False,
):
    """Vectorized corner index/weight computation across all levels.

    Returns:
      flat_idx: (B, Q, H, L, P, 4) int32 indices into the flattened S axis
        (or level-local row indices when level_local=True)
      weight:   (B, Q, H, L, P, 4) bilinear weights (0 where out-of-bounds)
    """
    cdtype = sampling_locations.dtype
    wh = jnp.asarray(
        [[w, h] for h, w in spatial_shapes], dtype=cdtype
    )  # (L, 2) as (W, H)
    sizes, _ = _level_sizes(spatial_shapes)
    starts = jnp.asarray(
        [sum(sizes[:i]) for i in range(len(sizes))], dtype=jnp.int32
    )  # (L,)
    w_per_level = jnp.asarray([w for _, w in spatial_shapes], dtype=jnp.int32)
    h_per_level = jnp.asarray([h for h, _ in spatial_shapes], dtype=jnp.int32)

    # pixel coords: loc * size - 0.5  (grid_sample align_corners=False)
    xy = sampling_locations * wh[:, None, :] - 0.5  # (B, Q, H, L, P, 2)
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    W = w_per_level  # broadcasts over trailing P axis after expand
    H = h_per_level

    def corner(xi, yi, wgt):
        # validity BEFORE clamping; invalid corners get zero weight
        valid = (xi >= 0) & (xi < W[:, None]) & (yi >= 0) & (yi < H[:, None])
        xc = jnp.clip(xi, 0, W[:, None] - 1)
        yc = jnp.clip(yi, 0, H[:, None] - 1)
        idx = yc * W[:, None] + xc
        if not level_local:
            idx = starts[:, None] + idx
        return idx, jnp.where(valid, wgt, jnp.zeros_like(wgt))

    i00, w00 = corner(x0i, y0i, (1.0 - fx) * (1.0 - fy))
    i10, w10 = corner(x0i + 1, y0i, fx * (1.0 - fy))
    i01, w01 = corner(x0i, y0i + 1, (1.0 - fx) * fy)
    i11, w11 = corner(x0i + 1, y0i + 1, fx * fy)

    flat_idx = jnp.stack([i00, i10, i01, i11], axis=-1)
    weight = jnp.stack([w00, w10, w01, w11], axis=-1)
    return flat_idx, weight


def _separable_prepare(spatial_shapes, sampling_locations, attention_weights):
    """(B,Q,H,L,P,*) -> six (B*H, Q, L*P) arrays for the separable kernel:
    floor row/col indices and row/col bilinear weights, zeroed out of
    bounds, with the attention weight folded into the column weights."""
    loc = sampling_locations.astype(jnp.float32)
    attn = attention_weights.astype(jnp.float32)
    wh = jnp.asarray(
        [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
    )  # (L, 2) as (W, H)
    h_l = jnp.asarray([h for h, _ in spatial_shapes], dtype=jnp.float32)
    w_l = jnp.asarray([w for _, w in spatial_shapes], dtype=jnp.float32)

    xy = loc * wh[:, None, :] - 0.5  # (B, Q, H, L, P, 2)
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    H = h_l[:, None]  # broadcast over trailing P axis
    W = w_l[:, None]
    wy0 = (1.0 - fy) * ((y0 >= 0) & (y0 <= H - 1))
    wy1 = fy * ((y0 + 1 >= 0) & (y0 + 1 <= H - 1))
    wx0 = (1.0 - fx) * ((x0 >= 0) & (x0 <= W - 1)) * attn
    wx1 = fx * ((x0 + 1 >= 0) & (x0 + 1 <= W - 1)) * attn

    def pack(a, dtype=jnp.float32):
        B, Q, Hh, L, P = a.shape
        return jnp.transpose(a, (0, 2, 1, 3, 4)).reshape(B * Hh, Q, L * P).astype(dtype)

    return (
        pack(y0, jnp.int32),
        pack(x0, jnp.int32),
        pack(wy0),
        pack(wy1),
        pack(wx0),
        pack(wx1),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_pallas(spatial_shapes, value, loc, attn):
    """Locality-blocked Pallas forward (transposed layout + dynamic
    y-windows + scalar-prefetched window plans, ms_deform_attn_v4.py);
    value in the public (B, S, H, D) layout. Returns (B, Q, H*D) in
    value.dtype."""
    from rlipv2_tpu.ops.ms_deform_attn_v4 import ms_deform_attn_v4

    B, S, H, D = value.shape
    Q = loc.shape[1]
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(spatial_shapes, loc, attn)
    out = ms_deform_attn_v4(
        iy, ix, wy0, wy1, wx0, wx1, v, spatial_shapes
    )  # (BH, Q, D) f32
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_pallas_v5(spatial_shapes, value, loc, attn):
    """v5 forward (sub-slab level splitting + column-strip query
    permutation + dead-slab skipping, ms_deform_attn_v5.py): shrinks the
    one-hot dot width to the 128-lane floor for levels wider than 128
    columns. Exact; shares the v4 Pallas backward (both forwards compute
    the same function)."""
    from rlipv2_tpu.ops.ms_deform_attn_v5 import ms_deform_attn_v5

    B, S, H, D = value.shape
    Q = loc.shape[1]
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(spatial_shapes, loc, attn)
    out = ms_deform_attn_v5(
        iy, ix, wy0, wy1, wx0, wx1, v, spatial_shapes
    )  # (BH, Q, D) f32
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(value.dtype)


def _msda_pallas_v5_fwd(spatial_shapes, value, loc, attn):
    return _msda_pallas_v5(spatial_shapes, value, loc, attn), (value, loc, attn)


def _msda_pallas_int8(spatial_shapes, value, loc, attn):
    """int8 fast inference path (forward only, no VJP): per-(bh, level)
    max-abs value quantization + x127 mixer quantization, <~1% relative
    output error. Opt-in via impl='pallas_int8'; never the default."""
    from rlipv2_tpu.ops.ms_deform_attn_v4 import ms_deform_attn_v4_int8

    B, S, H, D = value.shape
    Q = loc.shape[1]
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(spatial_shapes, loc, attn)
    out = ms_deform_attn_v4_int8(
        iy, ix, wy0, wy1, wx0, wx1, v, spatial_shapes
    )
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(value.dtype)


def _msda_pallas_v3(spatial_shapes, value, loc, attn):
    """The v3 kernel (in-kernel window reductions + pl.when sweep) —
    kept for A/B benchmarking (ms_deform_attn_v3.py)."""
    from rlipv2_tpu.ops.ms_deform_attn_v3 import ms_deform_attn_transposed

    B, S, H, D = value.shape
    Q = loc.shape[1]
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(spatial_shapes, loc, attn)
    out = ms_deform_attn_transposed(
        iy, ix, wy0, wy1, wx0, wx1, v, spatial_shapes
    )
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(value.dtype)


def _msda_pallas_dense(spatial_shapes, value, loc, attn):
    """The dense separable kernel (no locality skipping) — kept for A/B
    benchmarking (ms_deform_attn_pallas.py)."""
    from rlipv2_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_separable

    B, S, H, D = value.shape
    Q = loc.shape[1]
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(spatial_shapes, loc, attn)
    out = ms_deform_attn_separable(
        iy, ix, wy0, wy1, wx0, wx1, v, spatial_shapes
    )
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(value.dtype)


def _msda_pallas_fwd(spatial_shapes, value, loc, attn):
    return _msda_pallas(spatial_shapes, value, loc, attn), (value, loc, attn)


def _msda_pallas_bwd(spatial_shapes, res, dout):
    """Pallas windowed backward: the kernel produces (dwy0, dwy1, dwx0,
    dwx1, dvalue); the chain to (dloc, dattn) rides XLA autodiff of the
    elementwise `_separable_prepare` weight math. Replaces both the
    reference's six CUDA scatter kernels
    (ms_deform_im2col_cuda.cuh:302-846) and round-1's XLA-gather VJP
    (which OOMs HBM at 832x1344 bs8: the gathered corner tensor alone is
    ~6 GB)."""
    from rlipv2_tpu.ops.ms_deform_attn_v4 import ms_deform_attn_v4_bwd

    value, loc, attn = res
    B, S, H, D = value.shape
    Q = loc.shape[1]
    v = jnp.swapaxes(value, 1, 2).reshape(B * H, S, D)
    iy, ix, wy0, wy1, wx0, wx1 = _separable_prepare(spatial_shapes, loc, attn)
    # dout (B, Q, H*D) -> (BH, Q, D)
    g = jnp.swapaxes(dout.reshape(B, Q, H, D), 1, 2).reshape(B * H, Q, D)
    gy0, gy1, gx0, gx1, dv = ms_deform_attn_v4_bwd(
        iy, ix, wy0, wy1, wx0, wx1, v, g, spatial_shapes
    )
    dvalue = jnp.swapaxes(dv.reshape(B, H, S, D), 1, 2).astype(value.dtype)

    def prepare_weights(l, a):
        _, _, a_wy0, a_wy1, a_wx0, a_wx1 = _separable_prepare(
            spatial_shapes, l, a
        )
        return a_wy0, a_wy1, a_wx0, a_wx1

    _, vjp = jax.vjp(prepare_weights, loc, attn)
    dloc, dattn = vjp((gy0, gy1, gx0, gx1))
    return dvalue, dloc.astype(loc.dtype), dattn.astype(attn.dtype)


_msda_pallas.defvjp(_msda_pallas_fwd, _msda_pallas_bwd)
_msda_pallas_v5.defvjp(_msda_pallas_v5_fwd, _msda_pallas_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _msda_pallas_zerograd(spatial_shapes, value, loc, attn):
    """PROFILING ONLY: v4 forward with a zero backward. Differencing a
    train step built on this against the real 'pallas' impl isolates the
    total in-model MSDA-backward cost (tools/profile_train.py). Never a
    training default — gradients through the op are silently dropped."""
    return _msda_pallas(spatial_shapes, value, loc, attn)


def _msda_zerograd_fwd(spatial_shapes, value, loc, attn):
    return _msda_pallas_zerograd(spatial_shapes, value, loc, attn), (
        value,
        loc,
        attn,
    )


def _msda_zerograd_bwd(spatial_shapes, res, dout):
    # zeros_like depends only on static shape/dtype, so XLA DCEs the
    # residual storage — the bwd truly costs nothing
    value, loc, attn = res
    return jnp.zeros_like(value), jnp.zeros_like(loc), jnp.zeros_like(attn)


_msda_pallas_zerograd.defvjp(_msda_zerograd_fwd, _msda_zerograd_bwd)


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "impl"))
def ms_deform_attn(
    value: jnp.ndarray,  # (B, S, H, D)
    spatial_shapes: SpatialShapes,  # static ((H0, W0), ...)
    sampling_locations: jnp.ndarray,  # (B, Q, H, L, P, 2)
    attention_weights: jnp.ndarray,  # (B, Q, H, L, P)
    impl: str = "auto",  # auto | pallas | xla
) -> jnp.ndarray:
    """Fused multi-scale deformable attention. Returns (B, Q, H*D).

    impl='pallas' routes to the one-hot-matmul MXU kernel (TPU); 'xla' is
    the gather-based formulation (any backend, and the numerics oracle);
    'auto' picks pallas on TPU."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _msda_pallas(
            spatial_shapes, value, sampling_locations, attention_weights
        )
    if impl == "pallas_zerograd":  # profiling only (see _msda_pallas_zerograd)
        return _msda_pallas_zerograd(
            spatial_shapes, value, sampling_locations, attention_weights
        )
    if impl == "pallas_v5":
        return _msda_pallas_v5(
            spatial_shapes, value, sampling_locations, attention_weights
        )
    if impl == "pallas_int8":
        return _msda_pallas_int8(
            spatial_shapes, value, sampling_locations, attention_weights
        )
    if impl == "pallas_v3":
        return _msda_pallas_v3(
            spatial_shapes, value, sampling_locations, attention_weights
        )
    if impl == "pallas_dense":
        return _msda_pallas_dense(
            spatial_shapes, value, sampling_locations, attention_weights
        )
    return _ms_deform_attn_xla(
        value, spatial_shapes, sampling_locations, attention_weights
    )


def _ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    sizes, total = _level_sizes(spatial_shapes)
    assert S == total, f"value S={S} != sum(level sizes)={total}"
    assert L == len(spatial_shapes)

    flat_idx, corner_w = _corner_indices_and_weights(
        spatial_shapes, sampling_locations
    )
    # fuse bilinear corner weights with softmaxed attention weights
    w = corner_w * attention_weights[..., None]  # (B, Q, H, L, P, 4)

    # one gather: (B, H, S, D) indexed at (B, H, Q*L*P*4)
    v = jnp.swapaxes(value, 1, 2)  # (B, H, S, D)
    idx = jnp.transpose(flat_idx, (0, 2, 1, 3, 4, 5)).reshape(B, H, -1)
    gathered = jnp.take_along_axis(v, idx[..., None], axis=2)  # (B,H,QLP4,D)
    gathered = gathered.reshape(B, H, Q, L * P * 4, D)

    w = jnp.transpose(w, (0, 2, 1, 3, 4, 5)).reshape(B, H, Q, L * P * 4)
    out = jnp.einsum(
        "bhqk,bhqkd->bhqd", w.astype(value.dtype), gathered,
        preferred_element_type=jnp.float32,
    )
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(value.dtype)


def ms_deform_attn_reference(
    value: jnp.ndarray,
    spatial_shapes: SpatialShapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Naive per-level oracle (mirrors the algorithm of the reference's
    pure-PyTorch `ms_deform_attn_core_pytorch`). Test/teaching use only."""
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    sizes, _ = _level_sizes(spatial_shapes)
    splits = [sum(sizes[:i]) for i in range(1, len(sizes))]
    values = jnp.split(value, splits, axis=1)

    out = jnp.zeros((B, Q, H, D), dtype=jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = values[lvl].reshape(B, h, w, H, D)
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, H, P, 2)
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0

        def sample(xi, yi):
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            # v[b, yc, xc, head, :] for each (b, q, head, p)
            g = v[
                jnp.arange(B)[:, None, None, None],
                yc,
                xc,
                jnp.arange(H)[None, None, :, None],
            ]  # (B, Q, H, P, D)
            return jnp.where(valid[..., None], g, 0.0)

        s = (
            sample(x0, y0) * ((1 - fx) * (1 - fy))[..., None]
            + sample(x0 + 1, y0) * (fx * (1 - fy))[..., None]
            + sample(x0, y0 + 1) * ((1 - fx) * fy)[..., None]
            + sample(x0 + 1, y0 + 1) * (fx * fy)[..., None]
        )
        out = out + jnp.sum(
            s * attention_weights[:, :, :, lvl, :, None], axis=3
        )
    return out.reshape(B, Q, H * D).astype(value.dtype)
