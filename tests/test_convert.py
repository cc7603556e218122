"""Weight-conversion fidelity: flax RoBERTa with converted weights must
reproduce HF torch RobertaModel outputs (random-init torch model — no
downloads needed)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

torch = pytest.importorskip("torch")

from rlipv2_tpu.config import TextEncoderConfig
from rlipv2_tpu.engine.convert import (
    convert_resnet,
    convert_roberta,
    filter_query_embeddings,
    numpyify,
)
from rlipv2_tpu.models.roberta import RobertaModel


def small_hf_config():
    from transformers import RobertaConfig

    return RobertaConfig(
        vocab_size=200,
        hidden_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=96,
        max_position_embeddings=64,
        type_vocab_size=1,
        pad_token_id=1,
        layer_norm_eps=1e-5,
    )


def test_roberta_output_fidelity():
    from transformers import RobertaModel as TorchRoberta

    hf_cfg = small_hf_config()
    torch.manual_seed(0)
    tmodel = TorchRoberta(hf_cfg).eval()

    cfg = TextEncoderConfig(
        vocab_size=200,
        hidden_size=48,
        num_layers=3,
        num_heads=4,
        intermediate_size=96,
        max_position_embeddings=64,
    )
    params = {"params": convert_roberta(numpyify(tmodel.state_dict()), num_layers=3)}
    jmodel = RobertaModel(cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 190, size=(3, 10)).astype(np.int64)
    mask = np.ones((3, 10), np.int64)
    mask[1, 7:] = 0
    ids[1, 7:] = 1  # pad token

    with torch.no_grad():
        t_out = tmodel(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        )
    j_hidden, j_pooled = jmodel.apply(
        params, jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(
        np.asarray(j_hidden), t_out.last_hidden_state.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_pooled), t_out.pooler_output.numpy(), atol=2e-5
    )


def test_resnet_conversion_structure():
    """Synthesize a torchvision-shaped state dict; converted tree must init
    and match our ResNet param structure exactly."""
    import jax

    from rlipv2_tpu.models.resnet import ResNet

    blocks = (1, 1, 1, 1)
    sd = {}

    def add_conv(name, o, i, k):
        sd[f"{name}.weight"] = np.random.randn(o, i, k, k).astype(np.float32)

    def add_bn(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    cin = 64
    feats = 64
    for stage in range(4):
        name = f"layer{stage + 1}.0"
        add_conv(f"{name}.conv1", feats, cin, 1)
        add_bn(f"{name}.bn1", feats)
        add_conv(f"{name}.conv2", feats, feats, 3)
        add_bn(f"{name}.bn2", feats)
        add_conv(f"{name}.conv3", feats * 4, feats, 1)
        add_bn(f"{name}.bn3", feats * 4)
        add_conv(f"{name}.downsample.0", feats * 4, cin, 1)
        add_bn(f"{name}.downsample.1", feats * 4)
        cin = feats * 4
        feats *= 2

    converted = convert_resnet(sd, blocks=blocks)
    model = ResNet(name_variant="resnet_test", num_outputs=3)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]

    ref_paths = {
        "/".join(p): v.shape
        for p, v in _flatten(ref)
    }
    conv_paths = {
        "/".join(p): v.shape
        for p, v in _flatten(converted)
    }
    assert ref_paths == conv_paths

    out = model.apply({"params": converted}, jnp.zeros((1, 64, 64, 3)))
    assert len(out) == 3


def _flatten(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out.extend(_flatten(v, prefix + (k,)))
        else:
            out.append((prefix + (k,), v))
    return out


def test_filter_query_embeddings():
    tgt = np.arange(20).reshape(10, 2).astype(np.float32)
    ref = np.arange(40).reshape(10, 4).astype(np.float32)
    t2, r2 = filter_query_embeddings(tgt, ref, 6)
    assert t2.shape == (6, 2) and (t2 == tgt[:6]).all()
    t3, r3 = filter_query_embeddings(tgt, ref, 25)
    assert t3.shape == (25, 2)
    np.testing.assert_array_equal(t3[10:20], tgt)
