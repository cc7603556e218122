"""Fused Pallas window attention for Swin backbones.

XLA executes Swin's (N=49, d=32) window attention as a batched chain of
tiny matmuls with HBM round-trips between QK, softmax and AV. This kernel
keeps the whole chain in VMEM and — critically — consumes the qkv
projection output IN ITS NATIVE LAYOUT (nWB, N, 3C): no XLA-side
transposes, no token padding (a first integration attempt that transposed
to head-major and padded 49 -> 56 outside the kernel measured SLOWER than
the einsum chain — the relayout copies cost more than the fusion saved).
Heads live on static lane slices inside the kernel; per window the h QK
dots issue back-to-back into an (h*N, N) scratch, one softmax pass covers
all heads, and the h AV dots assemble the output through a lane-sliced
scratch row block.

Replaces the reference's torch window attention
(models/swin/swin_transformer.py WindowAttention.forward) on the forward
path; the backward is the XLA formulation via custom_vjp (recompute), so
training gradients are unchanged.

Both formulations are latency-bound on (49, 32, 49) MXU dots (~46
cycles/dot across the 4 MXUs); the fused path wins by removing the
HBM round trips and softmax/bias kernels between them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_reference(qkv, bias, mask, h):
    """XLA oracle on the packed layout. qkv (nWB, N, 3C); bias (h, N, N);
    mask (nW, N, N) or None. Returns (nWB, N, C)."""
    nWB, N, C3 = qkv.shape
    C = C3 // 3
    d = C // h
    q = qkv[:, :, :C].reshape(nWB, N, h, d)
    k = qkv[:, :, C : 2 * C].reshape(nWB, N, h, d)
    v = qkv[:, :, 2 * C :].reshape(nWB, N, h, d)
    a = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
    a = a + bias[None].astype(a.dtype)
    if mask is not None:
        nW = mask.shape[0]
        a = a.reshape(nWB // nW, nW, h, N, N) + mask[None, :, None].astype(
            a.dtype
        )
        a = a.reshape(nWB, h, N, N)
    a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(nWB, N, C)


def _kernel(qkv_ref, bias_ref, mask_ref, out_ref, s_ref, o_ref, *,
            G, N, h, d, scale, with_mask):
    C = h * d
    for g in range(G):
        tile = qkv_ref[g]  # (N, 3C)
        for head in range(h):
            q = tile[:, head * d : (head + 1) * d]
            k = tile[:, C + head * d : C + (head + 1) * d]
            s_ref[pl.ds(head * N, N), :] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s = s_ref[...] * scale + bias_ref[...]  # (h*N, N)
        if with_mask:
            s = s + jnp.tile(mask_ref[g], (h, 1))
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv_ref.dtype)
        for head in range(h):
            v = tile[:, 2 * C + head * d : 2 * C + (head + 1) * d]
            o_ref[:, head * d : (head + 1) * d] = jax.lax.dot_general(
                p[head * N : (head + 1) * N, :], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
        out_ref[g] = o_ref[...]


def _fwd_impl(qkv, bias, mask, h, group):
    nWB, N, C3 = qkv.shape
    C = C3 // 3
    d = C // h
    G = group
    while nWB % G:
        G //= 2
    if mask is not None:
        # the per-program mask slice must not wrap a batch boundary:
        # reduce G until it divides nW (worst case G = 1)
        nW = mask.shape[0]
        while nW % G:
            G //= 2

    in_specs = [
        pl.BlockSpec((G, N, C3), lambda p: (p, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h * N, N), lambda p: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [qkv, bias.astype(jnp.float32).reshape(h * N, N)]
    with_mask = mask is not None
    if with_mask:
        nW = mask.shape[0]
        blocks_per_b = nW // G
        in_specs.append(
            pl.BlockSpec(
                (G, N, N),
                lambda p, bp=blocks_per_b: (p % bp, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask.astype(jnp.float32))
    else:
        in_specs.append(
            pl.BlockSpec((1, 1, 1), lambda p: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(jnp.zeros((1, 1, 1), jnp.float32))

    return pl.pallas_call(
        functools.partial(
            _kernel, G=G, N=N, h=h, d=d, scale=d ** -0.5,
            with_mask=with_mask,
        ),
        grid=(nWB // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (G, N, C), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nWB, N, C), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((h * N, N), jnp.float32),
            pltpu.VMEM((N, C), qkv.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(2 * 2 * nWB * h * N * N * d),
            bytes_accessed=int(nWB * N * (C3 + C) * 2),
            transcendentals=int(nWB * h * N * N),
        ),
    )(*operands)


def fused_window_attention(qkv, bias, mask, h: int, group: int = 8):
    """qkv: (nWB, N, 3C) packed projection output (nWB = B * nW windows,
    B-major); bias: (h, N, N) f32 relative-position bias; mask: (nW, N, N)
    f32 additive shift mask or None. Returns (nWB, N, C)."""
    if mask is None:
        return _plain_vjp(qkv, bias, h, group)
    return _masked_vjp(qkv, bias, mask, h, group)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _plain_vjp(qkv, bias, h, group):
    return _fwd_impl(qkv, bias, None, h, group)


def _plain_fwd(qkv, bias, h, group):
    return _fwd_impl(qkv, bias, None, h, group), (qkv, bias)


def _plain_bwd(h, group, res, g):
    qkv, bias = res
    _, vjp = jax.vjp(lambda a, b: _attn_reference(a, b, None, h), qkv, bias)
    return vjp(g)


_plain_vjp.defvjp(_plain_fwd, _plain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _masked_vjp(qkv, bias, mask, h, group):
    return _fwd_impl(qkv, bias, mask, h, group)


def _masked_fwd(qkv, bias, mask, h, group):
    return _fwd_impl(qkv, bias, mask, h, group), (qkv, bias, mask)


def _masked_bwd(h, group, res, g):
    qkv, bias, mask = res
    _, vjp = jax.vjp(
        lambda a, b, m: _attn_reference(a, b, m, h), qkv, bias, mask
    )
    return vjp(g)


_masked_vjp.defvjp(_masked_fwd, _masked_bwd)
