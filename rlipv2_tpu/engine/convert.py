"""PyTorch -> JAX weight conversion.

Capability parity with the reference's converter suite
(convert_parameters/*.py documents the key-space mapping; main.py:614-629
loads with query-embed filtering from util/misc.py:466-505).

Implemented converters:
  * RoBERTa (HF torch `RobertaModel` state_dict -> our flax RobertaModel
    params) — output-fidelity tested against transformers' torch model;
  * torchvision-style ResNet (DETR backbone key space) with BatchNorm
    folded into FrozenAffine scale/bias;
  * query-embedding filtering for warm starts with different num_queries
    (reference: util/misc.py:466-505 truncates/splits tgt+refpoint
    embeddings).

All converters take a plain {name: numpy array} state dict (load a .pth
with `torch.load(..., map_location='cpu')` and call `numpyify`).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def numpyify(state_dict) -> dict:
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _linear(sd, prefix):
    return {
        "kernel": sd[f"{prefix}.weight"].T.astype(np.float32),
        "bias": sd[f"{prefix}.bias"].astype(np.float32),
    }


def _layernorm(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"].astype(np.float32),
        "bias": sd[f"{prefix}.bias"].astype(np.float32),
    }


def convert_roberta(sd: Mapping[str, np.ndarray], num_layers: int = 12, prefix: str = "") -> dict:
    """HF torch RobertaModel state_dict -> flax params for
    rlipv2_tpu.models.roberta.RobertaModel."""

    def g(name):
        return sd[prefix + name]

    params = {
        "embeddings": {
            "word_embeddings": {"embedding": g("embeddings.word_embeddings.weight").astype(np.float32)},
            "position_embeddings": {"embedding": g("embeddings.position_embeddings.weight").astype(np.float32)},
            "token_type_embeddings": {"embedding": g("embeddings.token_type_embeddings.weight").astype(np.float32)},
            "ln": {
                "scale": g("embeddings.LayerNorm.weight").astype(np.float32),
                "bias": g("embeddings.LayerNorm.bias").astype(np.float32),
            },
        }
    }
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = convert_roberta_layer(sub, p)
    if prefix + "pooler.dense.weight" in sd:
        params["pooler_dense"] = _linear(sub, "pooler.dense")
    return params


def convert_roberta_layer(sd: Mapping[str, np.ndarray], p: str) -> dict:
    """One HF RobertaLayer -> our RobertaLayer params (also used for the
    ALIF language-path layers, reference models/modeling_roberta.py:340)."""
    return {
        "attention_self": {
            "query": _linear(sd, f"{p}.attention.self.query"),
            "key": _linear(sd, f"{p}.attention.self.key"),
            "value": _linear(sd, f"{p}.attention.self.value"),
        },
        "attention_output_dense": _linear(sd, f"{p}.attention.output.dense"),
        "attention_output_ln": _layernorm(sd, f"{p}.attention.output.LayerNorm"),
        "intermediate_dense": _linear(sd, f"{p}.intermediate.dense"),
        "output_dense": _linear(sd, f"{p}.output.dense"),
        "output_ln": _layernorm(sd, f"{p}.output.LayerNorm"),
    }


def _conv(sd, name):
    # torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)
    return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0).astype(np.float32)}


def _frozen_bn(sd, name, eps=1e-5):
    """Fold BN buffers to FrozenAffine scale/bias."""
    gamma = sd[f"{name}.weight"].astype(np.float64)
    beta = sd[f"{name}.bias"].astype(np.float64)
    mean = sd[f"{name}.running_mean"].astype(np.float64)
    var = sd[f"{name}.running_var"].astype(np.float64)
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return {"scale": scale.astype(np.float32), "bias": bias.astype(np.float32)}


def convert_resnet(sd: Mapping[str, np.ndarray], blocks=(3, 4, 6, 3), prefix: str = "") -> dict:
    """torchvision-style ResNet state_dict -> our ResNet params (FrozenBN
    folded)."""

    def g(name):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    sub = g("")
    params = {
        "conv1": _conv(sub, "conv1"),
        "bn1": _frozen_bn(sub, "bn1"),
    }
    for stage, n in enumerate(blocks):
        for b in range(n):
            p = f"layer{stage + 1}.{b}"
            blk = {
                "conv1": _conv(sub, f"{p}.conv1"),
                "bn1": _frozen_bn(sub, f"{p}.bn1"),
                "conv2": _conv(sub, f"{p}.conv2"),
                "bn2": _frozen_bn(sub, f"{p}.bn2"),
                "conv3": _conv(sub, f"{p}.conv3"),
                "bn3": _frozen_bn(sub, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sub:
                blk["downsample_conv"] = _conv(sub, f"{p}.downsample.0")
                blk["downsample_bn"] = _frozen_bn(sub, f"{p}.downsample.1")
            params[f"layer{stage + 1}_block{b}"] = blk
    return params


def filter_query_embeddings(
    tgt: np.ndarray, refpoint: np.ndarray, num_queries: int
) -> tuple[np.ndarray, np.ndarray]:
    """Warm-start query filtering (reference: util/misc.py:466-505):
    truncate when the checkpoint has more queries; tile when fewer."""
    n = tgt.shape[0]
    if n >= num_queries:
        return tgt[:num_queries], refpoint[:num_queries]
    reps = -(-num_queries // n)
    return (
        np.tile(tgt, (reps, 1))[:num_queries],
        np.tile(refpoint, (reps, 1))[:num_queries],
    )
