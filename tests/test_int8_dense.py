"""int8 dense projections (ops/int8_dense.py): tensor-level error bounds,
nn.Dense drop-in compatibility, and a metric-level mAP-delta gate on the
full flagship-structure model (tiny dims) mirroring test_int8_metric.py.

The W8A8 path is the round-5 answer to the measured perf analysis
(SURVEY §6): the exact MSDA kernel's ~35 img/s ceiling and Swin-L's
stage-3 matmuls at 64% MFU make dense-stack quantization the remaining
model-level lever. Reference counterpart being beaten: fp torch
projections (models/swin/swin_transformer.py:126-186,
models/deformable_transformer.py:927-941 — the reference has no
quantized path).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rlipv2_tpu.config import (  # noqa: E402
    BackboneConfig,
    FusionConfig,
    ModelConfig,
    TextEncoderConfig,
    TransformerConfig,
)
from rlipv2_tpu.ops.int8_dense import Int8Dense, int8_matmul  # noqa: E402


def test_int8_matmul_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 37, 256).astype(np.float32))
    w = jnp.asarray(rng.randn(256, 512).astype(np.float32) * 0.05)
    ref = x @ w
    q = int8_matmul(x, w)
    rel = float(jnp.abs(q - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, f"int8 matmul rel err {rel}"


def test_int8_matmul_outlier_tokens():
    """Per-token activation scales keep outlier rows from poisoning the
    rest of the batch (the failure mode of per-tensor quantization on
    LayerNorm'd streams)."""
    rng = np.random.RandomState(1)
    x = rng.randn(8, 64).astype(np.float32)
    x[3] *= 100.0  # one outlier token
    w = rng.randn(64, 32).astype(np.float32) * 0.1
    ref = jnp.asarray(x) @ jnp.asarray(w)
    q = int8_matmul(jnp.asarray(x), jnp.asarray(w))
    # error of NON-outlier rows must be bounded by their own row scale
    err = np.abs(np.asarray(q - ref))
    norm = np.abs(np.asarray(ref))
    rows = [i for i in range(8) if i != 3]
    rel = err[rows].max() / norm[rows].max()
    assert rel < 0.03, f"outlier token leaked into other rows: {rel}"


def test_int8_dense_is_a_dense_drop_in():
    """Same param tree, same shapes, same init stream as nn.Dense — a
    converted reference checkpoint loads into the int8 model unchanged."""
    x = jnp.zeros((2, 5, 48))
    p1 = nn.Dense(96).init(jax.random.PRNGKey(0), x)
    p2 = Int8Dense(96).init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and applying fp params through the int8 module approximates fp out
    rng = np.random.RandomState(2)
    xr = jnp.asarray(rng.randn(2, 5, 48).astype(np.float32))
    o1 = nn.Dense(96).apply(p1, xr)
    o2 = Int8Dense(96).apply(p1, xr)
    rel = float(jnp.abs(o1 - o2).max() / jnp.abs(o1).max())
    assert rel < 0.03


def _cfg(int8: bool) -> ModelConfig:
    return ModelConfig(
        backbone=BackboneConfig(int8_dense=int8),
        text_encoder=TextEncoderConfig(
            vocab_size=1000, hidden_size=64, num_layers=1, num_heads=4,
            intermediate_size=128, max_position_embeddings=64,
        ),
        transformer=TransformerConfig(
            hidden_dim=64, nheads=4, enc_layers=2, dec_layers=1,
            dim_feedforward=128, msda_impl="xla", int8_dense=int8,
            fusion=FusionConfig(embed_dim=128, num_heads=4),
        ),
        num_queries=16,
        max_obj_texts=8,
        max_verb_texts=8,
        dtype="float32",
    )


def test_int8_dense_model_map_delta():
    """Full flagship-structure model (tiny dims), exact vs int8 dense
    stacks: same canned-GT mAP protocol as test_int8_metric.py, delta
    < 0.1 points on the reference 0-100 scale."""
    from rlipv2_tpu.eval.int8_gate import map_delta_points
    from rlipv2_tpu.eval.postprocess import postprocess_hoi, to_image_results
    from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params

    B, H, W = 2, 64, 64
    rng = np.random.RandomState(0)
    cfg = _cfg(False)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    pixels = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    valid = jnp.ones((B, H, W), bool)
    text_emb = jnp.asarray(
        rng.randn(B, T, cfg.text_encoder.hidden_size).astype(np.float32)
    )
    text_valid = jnp.ones((B, T), bool)

    model = RLIPParSeDA(cfg)
    params = init_model_params(
        model, jax.random.PRNGKey(0), pixels[:1], valid[:1],
        text_emb[:1], text_valid[:1], cfg.max_obj_texts,
        jnp.ones((2, 8), jnp.int32), jnp.ones((2, 8), jnp.int32),
    )

    def forward(int8):
        m = RLIPParSeDA(_cfg(int8))
        return jax.device_get(
            m.apply(params, pixels, valid, text_emb, text_valid,
                    cfg.max_obj_texts)
        )

    out_exact = forward(False)
    out_int8 = forward(True)

    orig_sizes = jnp.asarray([[H, W]] * B, jnp.float32)
    res_exact = to_image_results(postprocess_hoi(
        jax.tree_util.tree_map(jnp.asarray, out_exact), orig_sizes))
    res_int8 = to_image_results(postprocess_hoi(
        jax.tree_util.tree_map(jnp.asarray, out_int8), orig_sizes))

    # shared canned-GT protocol (eval/int8_gate.py; flagship-dims
    # measured delta lives in bench.py)
    delta, m_e, m_8 = map_delta_points(
        res_exact, res_int8, cfg.max_verb_texts, cfg.max_obj_texts
    )
    assert delta < 0.1, (
        f"int8-dense mAP delta {delta:.3f} points "
        f"(exact {m_e * 100:.2f}, int8 {m_8 * 100:.2f})"
    )


def test_train_step_never_uses_int8_dense():
    """The CLI guards --int8_dense behind --eval (cli.py): a training
    config must never carry the quantized path (round gradients are
    zero)."""
    import rlipv2_tpu.cli as cli

    p = cli.get_parser()
    args = p.parse_args(["--preset", "rlip_parseda_v2_r50", "--int8_dense"])
    with pytest.raises(AssertionError):
        cli.build_everything(args)
