"""MS-deformable-attention correctness: fused XLA op vs naive oracle vs an
independent torch.grid_sample composition (same harness role as the
reference's models/ops/test.py fwd-equivalence + gradcheck)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.ops import ms_deform_attn, ms_deform_attn_reference

SHAPES = ((6, 8), (3, 4), (2, 2))  # (H, W) per level


def make_inputs(rng, B=2, Q=7, H=4, D=8, P=3, shapes=SHAPES):
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, H, D).astype(np.float32)
    # locations mostly in [0,1] with some outside to exercise zero-padding
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, H, L, P, 2)).astype(np.float32)
    attn = rng.rand(B, Q, H, L, P).astype(np.float32)
    attn = attn / attn.sum(axis=(-2, -1), keepdims=True)
    return value, loc, attn


def torch_oracle(value, shapes, loc, attn):
    """Independent oracle built directly on F.grid_sample."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    attn = torch.from_numpy(attn)
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    sizes = [h * w for h, w in shapes]
    vs = value.split(sizes, dim=1)
    out = torch.zeros(B, Q, H, D)
    for lvl, (h, w) in enumerate(shapes):
        v = vs[lvl].reshape(B, h, w, H, D).permute(0, 3, 4, 1, 2)
        v = v.reshape(B * H, D, h, w)
        grid = 2 * loc[:, :, :, lvl] - 1  # (B, Q, H, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
        s = F.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )  # (B*H, D, Q, P)
        s = s.reshape(B, H, D, Q, P).permute(0, 3, 1, 4, 2)  # (B,Q,H,P,D)
        out += (s * attn[:, :, :, lvl, :, None]).sum(dim=3)
    return out.reshape(B, Q, H * D).numpy()


def test_fused_matches_naive():
    rng = np.random.RandomState(0)
    value, loc, attn = make_inputs(rng)
    fused = ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
    naive = ms_deform_attn_reference(
        jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn)
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive), atol=1e-5)


def test_fused_matches_torch_grid_sample():
    rng = np.random.RandomState(1)
    value, loc, attn = make_inputs(rng)
    fused = ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(attn))
    ref = torch_oracle(value, SHAPES, loc, attn)
    np.testing.assert_allclose(np.asarray(fused), ref, atol=1e-5)


def test_grad_finite_differences():
    """gradcheck-style: VJP against central finite differences."""
    rng = np.random.RandomState(2)
    value, loc, attn = make_inputs(rng, B=1, Q=3, H=2, D=4, P=2, shapes=((4, 5), (2, 3)))
    shapes = ((4, 5), (2, 3))

    def f(v, l, a):
        return jnp.sum(
            jnp.sin(ms_deform_attn(v, shapes, l, a))
        )

    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))
    grads = jax.grad(f, argnums=(0, 1, 2))(*args)
    eps = 1e-3
    rs = np.random.RandomState(3)
    for argi, g in enumerate(grads):
        arr = np.asarray(args[argi]).copy()
        # probe a handful of coordinates
        flat = arr.reshape(-1)
        for _ in range(10):
            k = rs.randint(flat.size)
            fp = flat.copy()
            fm = flat.copy()
            fp[k] += eps
            fm[k] -= eps
            largs = list(args)
            largs[argi] = jnp.asarray(fp.reshape(arr.shape))
            up = float(f(*largs))
            largs[argi] = jnp.asarray(fm.reshape(arr.shape))
            um = float(f(*largs))
            fd = (up - um) / (2 * eps)
            an = float(np.asarray(g).reshape(-1)[k])
            # sampling-location grads can be exactly at a floor() kink;
            # tolerate generously but catch structural errors
            assert abs(fd - an) < 5e-2, (argi, k, fd, an)


def test_grad_matches_torch():
    """Full-gradient check against the autograd of the torch oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(4)
    shapes = ((5, 6), (3, 3))
    value, loc, attn = make_inputs(rng, B=2, Q=5, H=2, D=4, P=2, shapes=shapes)
    # keep locations strictly interior: grid_sample's boundary gradient
    # conventions differ exactly at padding borders
    loc = np.clip(loc, 0.05, 0.95)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    gj = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    sizes = [h * w for h, w in shapes]
    vs = tv.split(sizes, dim=1)
    out = torch.zeros(B, Q, H, D)
    for lvl, (h, w) in enumerate(shapes):
        v = vs[lvl].reshape(B, h, w, H, D).permute(0, 3, 4, 1, 2).reshape(B * H, D, h, w)
        grid = (2 * tl[:, :, :, lvl] - 1).permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
        s = F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
        s = s.reshape(B, H, D, Q, P).permute(0, 3, 1, 4, 2)
        out = out + (s * ta[:, :, :, lvl, :, None]).sum(dim=3)
    (out.reshape(B, Q, H * D) ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gj[0]), tv.grad.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gj[1]), tl.grad.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(gj[2]), ta.grad.numpy(), atol=2e-4)
