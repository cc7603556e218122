"""Swin converter: structural round-trip + functional check of the
patch-merging block permutation against the reference's concat order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.engine.convert import convert_swin
from rlipv2_tpu.models.swin import SWIN_SPECS, PatchMerging, SwinTransformer

torch = pytest.importorskip("torch")


def synth_swin_sd(spec):
    sd = {}
    rng = np.random.RandomState(0)

    def lin(name, din, dout):
        sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32)

    def ln(name, dim):
        sd[f"{name}.weight"] = rng.randn(dim).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(dim).astype(np.float32)

    C = spec.embed_dim
    sd["patch_embed.proj.weight"] = rng.randn(C, 3, 4, 4).astype(np.float32)
    sd["patch_embed.proj.bias"] = rng.randn(C).astype(np.float32)
    ln("patch_embed.norm", C)
    for s, depth in enumerate(spec.depths):
        dim = C * (2**s)
        heads = spec.num_heads[s]
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            ln(f"{p}.norm1", dim)
            ln(f"{p}.norm2", dim)
            lin(f"{p}.attn.qkv", dim, 3 * dim)
            lin(f"{p}.attn.proj", dim, dim)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.randn(
                (2 * spec.window_size - 1) ** 2, heads
            ).astype(np.float32)
            lin(f"{p}.mlp.fc1", dim, 4 * dim)
            lin(f"{p}.mlp.fc2", 4 * dim, dim)
        if s < len(spec.depths) - 1:
            sd[f"layers.{s}.downsample.reduction.weight"] = rng.randn(
                2 * dim, 4 * dim
            ).astype(np.float32)
            ln(f"layers.{s}.downsample.norm", 4 * dim)
    for s in (1, 2, 3):
        ln(f"norm{s}", C * (2**s))
    return sd


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v).shape
    return out


def test_swin_converter_structure():
    spec = SWIN_SPECS["swin_test"]
    model = SwinTransformer(spec)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    converted = convert_swin(synth_swin_sd(spec), spec)
    want, got = flatten(ref), flatten(converted)
    assert sorted(want) == sorted(got), (
        sorted(set(want) ^ set(got))[:8]
    )
    assert all(want[k] == got[k] for k in want)
    outs = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted)},
        jnp.zeros((1, 64, 64, 3)),
    )
    assert len(outs) == 3


def test_patch_merging_matches_torch_concat_order():
    """Functional: converted reduction must equal torch's
    [x0;x1;x2;x3] = [r0c0, r1c0, r0c1, r1c1] concat + norm + linear."""
    rng = np.random.RandomState(1)
    C, H, W = 8, 4, 6
    x = rng.randn(1, H, W, C).astype(np.float32)

    Wred = rng.randn(2 * C, 4 * C).astype(np.float32)
    nw = rng.randn(4 * C).astype(np.float32)
    nb = rng.randn(4 * C).astype(np.float32)

    # torch-side reference computation
    t = torch.from_numpy(x)
    x0 = t[:, 0::2, 0::2]
    x1 = t[:, 1::2, 0::2]
    x2 = t[:, 0::2, 1::2]
    x3 = t[:, 1::2, 1::2]
    cat = torch.cat([x0, x1, x2, x3], -1)
    normed = torch.nn.functional.layer_norm(
        cat, (4 * C,), torch.from_numpy(nw), torch.from_numpy(nb)
    )
    t_out = (normed @ torch.from_numpy(Wred).T).numpy()

    # apply the converter's documented permutation directly
    perm = [0, 2, 1, 3]
    params = {
        "params": {
            "norm": {
                "scale": jnp.asarray(nw.reshape(4, C)[perm].reshape(-1)),
                "bias": jnp.asarray(nb.reshape(4, C)[perm].reshape(-1)),
            },
            "reduction": {
                "kernel": jnp.asarray(
                    Wred.reshape(2 * C, 4, C)[:, perm].reshape(2 * C, 4 * C).T
                )
            },
        }
    }
    j_out = PatchMerging(C).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-4)
