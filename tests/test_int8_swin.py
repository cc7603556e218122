"""int8_dense threading through the Swin backbone: the quantized
qkv/proj/MLP path must load fp params unchanged and approximate the fp
forward (the model-level Swin counterpart of test_int8_dense's R50
coverage)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import jax.numpy as jnp  # noqa: E402

from rlipv2_tpu.models.swin import SwinTransformer  # noqa: E402


def test_swin_int8_dense_drop_in():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))

    fp = SwinTransformer.from_name("swin_test")
    q = SwinTransformer.from_name("swin_test", int8_dense=True)
    params = fp.init(jax.random.PRNGKey(0), x)
    # identical param trees: converted checkpoints load unchanged
    assert (
        jax.tree_util.tree_structure(params)
        == jax.tree_util.tree_structure(q.init(jax.random.PRNGKey(0), x))
    )

    outs_fp = fp.apply(params, x)
    outs_q = q.apply(params, x)
    assert len(outs_fp) == len(outs_q) == 3
    deltas = []
    for a, b in zip(outs_fp, outs_q):
        assert a.shape == b.shape
        scale = float(jnp.abs(a).max())
        deltas.append(float(jnp.abs(a - b).max()) / scale)
    # quantized path differs (non-vacuous) but stays close per stage
    assert max(deltas) > 0.0
    assert max(deltas) < 0.15, deltas
