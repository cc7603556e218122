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


def _copy_tree(tree):
    """Deep-copy a nested dict of numpy arrays (decoder duplication)."""
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return np.copy(tree)


def _stack_trees(trees):
    """Stack structurally identical nested dicts of arrays into one tree
    with a leading layer axis — the nn.scan param layout the models use
    for their identical-layer stacks (models/roberta.py RobertaModel
    "layers", models/deformable.py ALIFEncoder "blocks",
    DeformableEncoder "layers")."""
    out = {}
    for k in trees[0]:
        vals = [t[k] for t in trees]
        if isinstance(vals[0], dict):
            out[k] = _stack_trees(vals)
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


def group_dab_decoder_layers(dec: dict, dec_layers: int) -> dict:
    """Regroup flat per-layer DAB decoder params (`layer_{i}` + optional
    in-decoder `sub/obj_bbox_embed_{i}` box-head clones) into the scanned
    `layers` layout of models/dab_decoder.DABHOIDecoder: one stacked
    per-step subtree {layer, [sub_bbox_embed, obj_bbox_embed]}. The shared
    `ref_point_head` / `query_scale` subtrees (and anything else) stay at
    the decoder's top level. If any layer's box heads are absent (partial
    detector warm-starts), the heads are dropped from the overlay entirely
    and left to init by merge_param_trees — a stacked tree cannot be
    half-present."""
    out = {
        k: v
        for k, v in dec.items()
        if not (
            k.startswith("layer_")
            or k.startswith("sub_bbox_embed_")
            or k.startswith("obj_bbox_embed_")
        )
    }
    have_heads = all(
        f"sub_bbox_embed_{i}" in dec and f"obj_bbox_embed_{i}" in dec
        for i in range(dec_layers)
    )
    steps = []
    for i in range(dec_layers):
        step = {"layer": dec[f"layer_{i}"]}
        if have_heads:
            step["sub_bbox_embed"] = dec[f"sub_bbox_embed_{i}"]
            step["obj_bbox_embed"] = dec[f"obj_bbox_embed_{i}"]
        steps.append(step)
    out["layers"] = _stack_trees(steps)
    return out


def group_alif_blocks(enc: dict, enc_layers: int, n_fusion: int) -> dict:
    """Regroup flat per-layer ALIF params (`layer_{i}` global deformable
    layers + optional `vl_fuse_{f}` / `lang_layer_{f}` fusion params) into
    the scanned `blocks` layout: one stacked super-block of
    [vl_fuse, lang_layer, layer_0..interval-1] per fusion. Missing fusion
    subtrees (detector warm-starts seed only the deformable layers) are
    simply absent and left to init by merge_param_trees."""
    interval = enc_layers // n_fusion
    blocks = []
    for b in range(n_fusion):
        blk: dict = {}
        if f"vl_fuse_{b}" in enc:
            blk["vl_fuse"] = enc[f"vl_fuse_{b}"]
        if f"lang_layer_{b}" in enc:
            blk["lang_layer"] = enc[f"lang_layer_{b}"]
        for j in range(interval):
            blk[f"layer_{j}"] = enc[f"layer_{b * interval + j}"]
        blocks.append(blk)
    return {"blocks": _stack_trees(blocks)}


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
    params["layers"] = _stack_trees([
        convert_roberta_layer(sub, f"encoder.layer.{i}")
        for i in range(num_layers)
    ])
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


def _mha(sd, prefix, d_model, n_heads):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention
    params (functionally verified to 1e-7)."""
    hd = d_model // n_heads
    W = sd[f"{prefix}.in_proj_weight"].astype(np.float32)
    b = sd[f"{prefix}.in_proj_bias"].astype(np.float32)

    def dg(Wp, bp):
        return {"kernel": Wp.T.reshape(d_model, n_heads, hd),
                "bias": bp.reshape(n_heads, hd)}

    return {
        "query": dg(W[:d_model], b[:d_model]),
        "key": dg(W[d_model : 2 * d_model], b[d_model : 2 * d_model]),
        "value": dg(W[2 * d_model :], b[2 * d_model :]),
        "out": {
            "kernel": sd[f"{prefix}.out_proj.weight"].T.reshape(n_heads, hd, d_model).astype(np.float32),
            "bias": sd[f"{prefix}.out_proj.bias"].astype(np.float32),
        },
    }


def _mlp(sd, prefix, n_layers):
    return {
        f"layers_{i}": _linear(sd, f"{prefix}.layers.{i}") for i in range(n_layers)
    }


def _mbf(sd, prefix, cardinality=16):
    """MultiBranchFusion ModuleLists -> stacked einsum weights."""
    def stack(name, transpose):
        ws = [sd[f"{prefix}.{name}.{k}.weight"] for k in range(cardinality)]
        bs = [sd[f"{prefix}.{name}.{k}.bias"] for k in range(cardinality)]
        w = np.stack([w.T for w in ws]) if transpose else np.stack(ws)
        return w.astype(np.float32), np.stack(bs).astype(np.float32)

    w1, b1 = stack("fc_1", True)
    w2, b2 = stack("fc_2", True)
    w3, b3 = stack("fc_3", True)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3}


def _msda(sd, prefix):
    return {
        "sampling_offsets": _linear(sd, f"{prefix}.sampling_offsets"),
        "attention_weights": _linear(sd, f"{prefix}.attention_weights"),
        "value_proj": _linear(sd, f"{prefix}.value_proj"),
        "output_proj": _linear(sd, f"{prefix}.output_proj"),
    }


def _groupnorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32)}


def convert_alif_encoder(sd, enc_layers, n_fusion, prefix="transformer.encoder."):
    """Reference ALIF encoder key space -> our ALIFEncoder param subtree
    (reference: dab_deformable/deformable_transformer.py:791-886 layers +
    roberta_layers + VLFuse_layers). Shared by the full-model converter
    and the standalone encoder parity test."""
    enc: dict = {}
    for i in range(enc_layers):
        p = f"{prefix}layers.{i}"
        enc[f"layer_{i}"] = {
            "self_attn": _msda(sd, f"{p}.self_attn"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    for f in range(n_fusion):
        enc[f"lang_layer_{f}"] = convert_roberta_layer(
            {k.replace(f"{prefix}roberta_layers.{f}", "encoder.layer.0"): v
             for k, v in sd.items()
             if k.startswith(f"{prefix}roberta_layers.{f}.")},
            "encoder.layer.0",
        )
        vp = f"{prefix}VLFuse_layers.{f}.b_attn"
        fuse = {
            "layer_norm_v": _layernorm(sd, f"{vp}.layer_norm_v"),
            "layer_norm_l": _layernorm(sd, f"{vp}.layer_norm_l"),
            "gamma_v": sd[f"{vp}.gamma_v"].astype(np.float32),
            "gamma_l": sd[f"{vp}.gamma_l"].astype(np.float32),
            "attn": {
                name: _linear(sd, f"{vp}.attn.{name}")
                for name in ("v_proj", "l_proj", "values_v_proj",
                             "values_l_proj", "out_v_proj", "out_l_proj")
            },
        }
        # optional gating sub-layers (S*/LN modes)
        for tname, ours in (("gamma_v_down", "gate_v_down"), ("gamma_v_up", "gate_v_up"),
                            ("gamma_l_down", "gate_l_down"), ("gamma_l_up", "gate_l_up"),
                            ("gamma_v_one", "gate_v_up"), ("gamma_l_one", "gate_l_up")):
            if f"{vp}.{tname}.weight" in sd:
                fuse[ours] = _linear(sd, f"{vp}.{tname}")
        for tname, ours in (("layer_norm_gating_v", "gate_v_ln"),
                            ("layer_norm_gating_l", "gate_l_ln")):
            if f"{vp}.{tname}.weight" in sd:
                fuse[ours] = _layernorm(sd, f"{vp}.{tname}")
        enc[f"vl_fuse_{f}"] = fuse
    return group_alif_blocks(enc, enc_layers, n_fusion)


def convert_rlip_parseda(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """Full reference RLIP_ParSeDA checkpoint (state_dict['model'], key
    space documented in SURVEY.md §2.2/§2.4) -> our flax param tree.

    Covers: ResNet backbone (BN folded), the ALIF encoder (deformable
    layers + per-fusion RobertaLayer + VLFuse bi-attention with VXAc-family
    gating), both DAB decoders incl. the per-layer box-head clones the
    reference wires in from the top model (first num_pred -> ho decoder,
    second -> verb decoder, reference models/hoi.py:1981-1994), queries,
    input projections, text encoder, resizer, MBF and classification
    params. Swin backbones: round-2."""
    t = cfg.transformer
    d = t.hidden_dim
    n_fusion = t.enc_layers // t.fusion.fusion_interval
    num_pred = t.dec_layers

    params: dict = {}

    # --- backbone (reference keys: backbone.0.body.*) ---
    if cfg.backbone.name.startswith("resnet"):
        from rlipv2_tpu.models.resnet import STAGE_BLOCKS

        params["backbone"] = convert_resnet(
            sd, blocks=STAGE_BLOCKS[cfg.backbone.name],
            prefix="backbone.0.body.",
        )
    else:  # Swin (reference models/swin/backbone.py:103-205 key space)
        from rlipv2_tpu.models.swin import SWIN_SPECS

        params["backbone"] = convert_swin(
            sd, SWIN_SPECS[cfg.backbone.name], prefix="backbone.0.body.",
        )

    # --- input projections: input_proj.{i}.0 conv + .1 GroupNorm ---
    for i in range(t.num_feature_levels):
        params[f"input_proj_{i}"] = {
            "kernel": sd[f"input_proj.{i}.0.weight"].transpose(2, 3, 1, 0).astype(np.float32),
            "bias": sd[f"input_proj.{i}.0.bias"].astype(np.float32),
        }
        params[f"input_norm_{i}"] = _groupnorm(sd, f"input_proj.{i}.1")

    # --- queries / classification params ---
    params["tgt_embed"] = sd["tgt_embed.weight"].astype(np.float32)
    params["verb_tgt_embed"] = sd["verb_tgt_embed.weight"].astype(np.float32)
    params["refpoint_embed"] = sd["refpoint_embed.weight"].astype(np.float32)
    params["level_embed"] = sd["transformer.level_embed"].astype(np.float32)
    params["projection_text"] = _linear(sd, "projection_text")
    params["bias_obj_a"] = sd["bias_obj_a"].astype(np.float32)
    params["bias_pred_a"] = sd["bias_pred_a"].astype(np.float32)

    # --- ALIF encoder ---
    params["encoder"] = convert_alif_encoder(
        sd, t.enc_layers, n_fusion, prefix="transformer.encoder."
    )

    # --- decoders (box-head clones live in the decoders here) ---
    def decoder(name, torch_name, head_offset):
        dec: dict = {}
        for i in range(t.dec_layers):
            p = f"transformer.{torch_name}.layers.{i}"
            dec[f"layer_{i}"] = {
                "cross_attn": _msda(sd, f"{p}.cross_attn"),
                "self_attn": _mha(sd, f"{p}.self_attn", d, t.nheads),
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "norm3": _layernorm(sd, f"{p}.norm3"),
                "linear1": _linear(sd, f"{p}.linear1"),
                "linear2": _linear(sd, f"{p}.linear2"),
            }
        dec["ref_point_head"] = _mlp(sd, f"transformer.{torch_name}.ref_point_head", 2)
        dec["query_scale"] = _mlp(sd, f"transformer.{torch_name}.query_scale", 2)
        for l in range(t.dec_layers):
            dec[f"sub_bbox_embed_{l}"] = _mlp(
                sd, f"sub_bbox_embed.{head_offset + l}", 3
            )
            dec[f"obj_bbox_embed_{l}"] = _mlp(
                sd, f"obj_bbox_embed.{head_offset + l}", 3
            )
        return group_dab_decoder_layers(dec, t.dec_layers)

    params["ho_decoder"] = decoder("ho_decoder", "ho_decoder", 0)
    params["verb_decoder"] = decoder("verb_decoder", "verb_decoder", num_pred)

    # --- verb query generator (vanilla_MBF) ---
    if any(k.startswith("transformer.verb_tgt_generator.fc_1.0.") for k in sd):
        params["verb_tgt_generator"] = _mbf(sd, "transformer.verb_tgt_generator")

    # --- text encoder + resizer ---
    params["text_encoder"] = convert_roberta(
        sd, num_layers=cfg.text_encoder.num_layers,
        prefix="transformer.text_encoder.",
    )
    params["resizer"] = {
        "fc": _linear(sd, "transformer.resizer.fc"),
        "layer_norm": _layernorm(sd, "transformer.resizer.layer_norm"),
    }
    return params


def convert_swin(sd: Mapping[str, np.ndarray], spec, prefix: str = "") -> dict:
    """torch Swin (reference models/swin/swin_transformer.py key space:
    patch_embed / layers.{s}.blocks.{b} / layers.{s}.downsample /
    norm{1,2,3}) -> our flax SwinTransformer params.

    PatchMerging caveat: torch concatenates the 2x2 neighborhood as
    [r0c0, r1c0, r0c1, r1c1] while our reshape yields
    [r0c0, r0c1, r1c0, r1c1], so the reduction kernel's input blocks and
    the pre-norm params are permuted (blocks 1 <-> 2)."""

    def g(name):
        return sd[prefix + name]

    def lin(name):
        return {"kernel": g(f"{name}.weight").T.astype(np.float32),
                "bias": g(f"{name}.bias").astype(np.float32)}

    def lnm(name):
        return {"scale": g(f"{name}.weight").astype(np.float32),
                "bias": g(f"{name}.bias").astype(np.float32)}

    params: dict = {
        "patch_embed": {
            "kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0).astype(np.float32),
            "bias": g("patch_embed.proj.bias").astype(np.float32),
        },
        "patch_norm": lnm("patch_embed.norm"),
    }
    perm4 = [0, 2, 1, 3]  # torch block order -> ours
    for s, depth in enumerate(spec.depths):
        dim = spec.embed_dim * (2**s)
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            params[f"stage{s}_block{b}"] = {
                "norm1": lnm(f"{p}.norm1"),
                "norm2": lnm(f"{p}.norm2"),
                "attn": {
                    "qkv": lin(f"{p}.attn.qkv"),
                    "proj": lin(f"{p}.attn.proj"),
                    "relative_position_bias_table": g(
                        f"{p}.attn.relative_position_bias_table"
                    ).astype(np.float32),
                },
                "mlp_fc1": lin(f"{p}.mlp.fc1"),
                "mlp_fc2": lin(f"{p}.mlp.fc2"),
            }
        if s < len(spec.depths) - 1:
            W = g(f"layers.{s}.downsample.reduction.weight").astype(np.float32)
            # (2C_out, 4C_in): reorder the 4 input blocks then transpose
            Wb = W.reshape(2 * dim, 4, dim)[:, perm4].reshape(2 * dim, 4 * dim)
            nw = g(f"layers.{s}.downsample.norm.weight").astype(np.float32)
            nb = g(f"layers.{s}.downsample.norm.bias").astype(np.float32)
            params[f"merge{s}"] = {
                "reduction": {"kernel": Wb.T},
                "norm": {
                    "scale": nw.reshape(4, dim)[perm4].reshape(-1),
                    "bias": nb.reshape(4, dim)[perm4].reshape(-1),
                },
            }
    # out norms: reference registers norm{idx} for out_indices (1, 2, 3)
    for s in (1, 2, 3):
        if prefix + f"norm{s}.weight" in sd:
            params[f"out_norm{s}"] = lnm(f"norm{s}")
    return params


# COCO category ids used by HICO's 80-object remap, plus the appended
# background slot (reference: convert_parameters/convert_parameters_DABDDETR.py
# obj_ids table; datasets/hico.py:46-55 documents the same remap)
COCO_OBJ_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90, 91,
]


def coco_class_embed_to_hico(weight: np.ndarray, bias: np.ndarray,
                             bg_weight=None, bg_bias=None,
                             dataset: str = "hico"):
    """Remap a COCO 91-way class head to HICO's 80 objects + no-object
    slot (reference: convert_parameters_DABDDETR.py:142-147 appends a
    fresh background row then gathers obj_ids). dataset="vcoco" further
    inserts one fresh object row BEFORE the background slot (V-COCO's
    extra no-object pairing class, reference:
    convert_parameters/convert_DABDETR.py:80-92)."""
    rng = np.random.RandomState(0)
    if bg_weight is None:
        bg_weight = (rng.randn(1, weight.shape[1]) / np.sqrt(weight.shape[1])).astype(np.float32)
    if bg_bias is None:
        bg_bias = np.zeros((1,), np.float32)
    w = np.concatenate([weight, bg_weight], axis=0)
    b = np.concatenate([bias, bg_bias], axis=0)
    w, b = w[COCO_OBJ_IDS], b[COCO_OBJ_IDS]
    if dataset == "vcoco":
        extra_w = (rng.randn(1, w.shape[1]) / np.sqrt(w.shape[1])).astype(
            np.float32
        )
        extra_b = np.zeros((1,), np.float32)
        w = np.concatenate([w[:-1], extra_w, w[-1:]], axis=0)
        b = np.concatenate([b[:-1], extra_b, b[-1:]], axis=0)
    return w, b


def merge_param_trees(base: dict, update: dict) -> dict:
    """Recursively overlay `update` onto `base` (both plain nested dicts);
    used for partial warm-starts where the detector checkpoint covers only
    the vision/decoder subtree."""
    out = dict(base)
    for k, v in update.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_param_trees(out[k], v)
        else:
            out[k] = v
    return out


def convert_dab_ddetr_detector(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """COCO-pretrained DAB-Deformable-DETR detector checkpoint -> partial
    RLIPParSeDA warm-start tree.

    Mirrors the reference's key-space surgery
    (convert_parameters/convert_parameters_DABDDETR.py:91-160): the single
    detector decoder is duplicated into the ho and verb decoders, the
    per-layer `transformer.decoder.bbox_embed` clones are duplicated into
    the sub/obj box heads of both decoders, and `tgt_embed` is duplicated
    into `verb_tgt_embed`. The plain DDETR encoder layers seed the ALIF
    encoder's deformable layers (fusion + language params stay at init —
    the reference pretrain starts them fresh too). Text-side params
    (text encoder, resizer, projection) are NOT in a detector checkpoint
    and are left to the caller's init via `merge_param_trees`."""
    t = cfg.transformer
    d = t.hidden_dim
    num_pred = t.dec_layers

    params: dict = {}
    from rlipv2_tpu.models.resnet import STAGE_BLOCKS

    if any(k.startswith("backbone.0.body.") for k in sd):
        params["backbone"] = convert_resnet(
            sd, blocks=STAGE_BLOCKS[cfg.backbone.name],
            prefix="backbone.0.body.",
        )
    for i in range(t.num_feature_levels):
        if f"input_proj.{i}.0.weight" in sd:
            params[f"input_proj_{i}"] = {
                "kernel": sd[f"input_proj.{i}.0.weight"].transpose(2, 3, 1, 0).astype(np.float32),
                "bias": sd[f"input_proj.{i}.0.bias"].astype(np.float32),
            }
            params[f"input_norm_{i}"] = _groupnorm(sd, f"input_proj.{i}.1")

    nq = cfg.num_queries
    tgt, ref = filter_query_embeddings(
        sd["tgt_embed.weight"].astype(np.float32),
        sd["refpoint_embed.weight"].astype(np.float32),
        nq,
    )
    params["tgt_embed"] = tgt
    params["verb_tgt_embed"] = tgt.copy()  # reference duplicates tgt_embed
    params["refpoint_embed"] = ref
    params["level_embed"] = sd["transformer.level_embed"].astype(np.float32)

    # plain DDETR encoder layers -> ALIF deformable layers (scanned
    # blocks layout; the fusion/language subtrees stay at init, so the
    # overlay only carries the stacked layer_{j} leaves)
    enc: dict = {}
    for i in range(t.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        if f"{p}.self_attn.value_proj.weight" not in sd:
            break
        enc[f"layer_{i}"] = {
            "self_attn": _msda(sd, f"{p}.self_attn"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    if len(enc) == t.enc_layers:
        params["encoder"] = group_alif_blocks(
            enc, t.enc_layers, t.enc_layers // t.fusion.fusion_interval
        )

    def decoder_from_detector():
        dec: dict = {}
        for i in range(t.dec_layers):
            p = f"transformer.decoder.layers.{i}"
            dec[f"layer_{i}"] = {
                "cross_attn": _msda(sd, f"{p}.cross_attn"),
                "self_attn": _mha(sd, f"{p}.self_attn", d, t.nheads),
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "norm3": _layernorm(sd, f"{p}.norm3"),
                "linear1": _linear(sd, f"{p}.linear1"),
                "linear2": _linear(sd, f"{p}.linear2"),
            }
        dec["ref_point_head"] = _mlp(sd, "transformer.decoder.ref_point_head", 2)
        if "transformer.decoder.query_scale.layers.0.weight" in sd:
            dec["query_scale"] = _mlp(sd, "transformer.decoder.query_scale", 2)
        # per-layer detector box heads -> sub AND obj clones
        for l in range(num_pred):
            src = (
                f"transformer.decoder.bbox_embed.{l}"
                if f"transformer.decoder.bbox_embed.{l}.layers.0.weight" in sd
                else f"bbox_embed.{l}"
            )
            if f"{src}.layers.0.weight" in sd:
                head = _mlp(sd, src, 3)
                dec[f"sub_bbox_embed_{l}"] = head
                dec[f"obj_bbox_embed_{l}"] = {
                    k: dict(v) for k, v in head.items()
                }
        return dec

    dec = group_dab_decoder_layers(decoder_from_detector(), t.dec_layers)
    params["ho_decoder"] = dec
    params["verb_decoder"] = _copy_tree(dec)
    return params


def convert_ddetr_detector(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """COCO-pretrained (plain) Deformable-DETR detector checkpoint ->
    partial RLIPParSeD warm-start tree.

    Reference surgery (convert_parameters/convert_parameters_DDETR.py:91-126):
    the single detector decoder is duplicated into ho and verb decoders and
    the per-layer `bbox_embed` clones seed BOTH the sub and obj box heads;
    here the box heads are the model's top-level `sub/obj_bbox_embed_{l}`
    (RLIPParSeD keeps refinement outside the decoder). The detector's
    2-d `transformer.reference_points` linear seeds both
    `reference_points_sub` and `reference_points_obj`, and `query_embed`
    ([query_pos || tgt], nq x 2C) is tiled/truncated to num_queries with
    the first half repeated for the sub/obj split (reference
    convert_parameters.py:151-152 semantics)."""
    t = cfg.transformer
    d = t.hidden_dim
    params: dict = {}
    from rlipv2_tpu.models.resnet import STAGE_BLOCKS

    if any(k.startswith("backbone.0.body.") for k in sd):
        params["backbone"] = convert_resnet(
            sd, blocks=STAGE_BLOCKS[cfg.backbone.name],
            prefix="backbone.0.body.",
        )
    for i in range(t.num_feature_levels):
        if f"input_proj.{i}.0.weight" in sd:
            params[f"input_proj_{i}"] = {
                "kernel": sd[f"input_proj.{i}.0.weight"].transpose(2, 3, 1, 0).astype(np.float32),
                "bias": sd[f"input_proj.{i}.0.bias"].astype(np.float32),
            }
            params[f"input_norm_{i}"] = _groupnorm(sd, f"input_proj.{i}.1")
    if "transformer.level_embed" in sd:
        params["level_embed"] = sd["transformer.level_embed"].astype(np.float32)

    nq = cfg.num_queries
    qe = sd["query_embed.weight"].astype(np.float32)  # (nq_ckpt, 2C)
    half = np.concatenate([qe[: nq // 2], qe[: nq // 2]], axis=0)
    if half.shape[0] < nq:  # checkpoint smaller than nq//2: tile
        reps = -(-nq // half.shape[0])
        half = np.tile(half, (reps, 1))[:nq]
    params["query_embed"] = half

    rp = _linear(sd, "transformer.reference_points")
    params["reference_points_sub"] = rp
    params["reference_points_obj"] = {k: v.copy() for k, v in rp.items()}

    enc: dict = {}
    for i in range(t.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        if f"{p}.self_attn.value_proj.weight" not in sd:
            break
        enc[f"layer_{i}"] = {
            "self_attn": _msda(sd, f"{p}.self_attn"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    if len(enc) == t.enc_layers:
        params["encoder"] = group_alif_blocks(
            enc, t.enc_layers, t.enc_layers // t.fusion.fusion_interval
        )

    dec: dict = {}
    for i in range(t.dec_layers):
        p = f"transformer.decoder.layers.{i}"
        dec[f"layer_{i}"] = {
            "cross_attn": _msda(sd, f"{p}.cross_attn"),
            "self_attn": _mha(sd, f"{p}.self_attn", d, t.nheads),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "norm3": _layernorm(sd, f"{p}.norm3"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }
    dec = group_dab_decoder_layers(dec, t.dec_layers)
    params["ho_decoder_nd"] = dec
    params["verb_decoder_nd"] = _copy_tree(dec)

    # per-layer detector box heads -> top-level sub/obj clones
    for l in range(t.dec_layers):
        src = (
            f"transformer.decoder.bbox_embed.{l}"
            if f"transformer.decoder.bbox_embed.{l}.layers.0.weight" in sd
            else f"bbox_embed.{l}"
        )
        if f"{src}.layers.0.weight" not in sd and "bbox_embed.layers.0.weight" in sd:
            src = "bbox_embed"  # shared (no box-refine) checkpoints
        if f"{src}.layers.0.weight" in sd:
            head = _mlp(sd, src, 3)
            params[f"sub_bbox_embed_{l}"] = head
            params[f"obj_bbox_embed_{l}"] = {
                k: dict(v) for k, v in head.items()
            }
    return params


def convert_detr_detector(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """COCO-pretrained vanilla DETR (or MDETR) checkpoint -> partial
    RLIPParSeV1Joint warm-start tree.

    Reference surgery (convert_parameters/convert_parameters.py:129-141 and
    convert_MDETR_to_RLIP.py:143-152, both live paths): the single decoder
    is duplicated into the ho and verb decoders, the box head is cloned
    into sub/obj heads, and `query_embed` keeps its first nq/2 rows twice
    (the sub/obj halves start identical). Dense encoder layers map 1:1;
    the decoder's image cross-attention comes from DETR's `multihead_attn`
    (MDETR names it `cross_attn_image` — both accepted)."""
    t = cfg.transformer
    d = t.hidden_dim
    params: dict = {}
    from rlipv2_tpu.models.resnet import STAGE_BLOCKS

    if any(k.startswith("backbone.0.body.") for k in sd):
        # RLIPParSeV1Joint builds its ResNet inline (auto-scope ResNet_0)
        params["ResNet_0"] = convert_resnet(
            sd, blocks=STAGE_BLOCKS[cfg.backbone.name],
            prefix="backbone.0.body.",
        )
    if "input_proj.weight" in sd:  # 1x1 conv == dense over channels
        params["input_proj"] = {
            "kernel": sd["input_proj.weight"][:, :, 0, 0].T.astype(np.float32),
            "bias": sd["input_proj.bias"].astype(np.float32),
        }

    nq = cfg.num_queries
    qe = sd["query_embed.weight"].astype(np.float32)
    params["query_embed"] = np.concatenate(
        [qe[: nq // 2], qe[: nq // 2]], axis=0
    )[:nq]

    for i in range(t.enc_layers):
        p = f"transformer.encoder.layers.{i}"
        if f"{p}.self_attn.in_proj_weight" not in sd:
            break
        params[f"enc_{i}"] = {
            "self_attn": _mha(sd, f"{p}.self_attn", d, t.nheads),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "linear1": _linear(sd, f"{p}.linear1"),
            "linear2": _linear(sd, f"{p}.linear2"),
        }

    for name in ("ho", "verb"):
        for i in range(t.dec_layers):
            p = f"transformer.decoder.layers.{i}"
            ca = (
                f"{p}.cross_attn_image"
                if f"{p}.cross_attn_image.in_proj_weight" in sd
                else f"{p}.multihead_attn"
            )
            # MDETR layers number their norms 1/3/4 (2 is the text slot)
            n2 = f"{p}.norm3" if f"{p}.norm4.weight" in sd else f"{p}.norm2"
            n3 = f"{p}.norm4" if f"{p}.norm4.weight" in sd else f"{p}.norm3"
            params[f"{name}_dec_{i}"] = {
                "self_attn": _mha(sd, f"{p}.self_attn", d, t.nheads),
                "cross_attn": _mha(sd, ca, d, t.nheads),
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, n2),
                "norm3": _layernorm(sd, n3),
                "linear1": _linear(sd, f"{p}.linear1"),
                "linear2": _linear(sd, f"{p}.linear2"),
            }
        if "transformer.decoder.norm.weight" in sd:
            params[f"{name}_decoder_norm"] = _layernorm(
                sd, "transformer.decoder.norm"
            )

    if "bbox_embed.layers.0.weight" in sd:
        head = _mlp(sd, "bbox_embed", 3)
        params["sub_bbox_embed"] = head
        params["obj_bbox_embed"] = {k: dict(v) for k, v in head.items()}
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
