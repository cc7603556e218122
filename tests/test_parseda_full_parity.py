"""FULL-MODEL RLIP-ParSeDA parity vs the torch reference.

Runs the complete reference pipeline — ResNet backbone (FrozenBN) ->
input projections -> ALIF encoder -> DAB ho/verb decoders -> einsum
bias-trick heads (reference models/hoi.py:1871-2257 `RLIP_ParSeDA` +
models/dab_deformable/deformable_transformer.py:234-744) — on random
weights at reduced depth (enc 4 / dec 2, resnet_test), converts the torch
state_dict with `engine.convert.convert_rlip_parseda`, and asserts
end-to-end closeness of pred_obj_logits / pred_verb_logits /
pred_sub_boxes / pred_obj_boxes plus the aux layer. This closes the seams
the per-component parity tests (ALIF, DAB decoder, MSDA, RoBERTa) leave
unverified: input projs + GroupNorm, level embeds, sine pos over the real
backbone grid, query splitting, text projection plumbing, box-head clone
wiring, verb-query MBF seeding (VERDICT round-2 item 2).

The text path is fed PRE-POOLED label features through the reference's
eval-style `text=(mask, memory, sums)` branch
(dab_deformable/deformable_transformer.py:575-596) — tokenizer + RoBERTa
pooling parity is covered separately (tests/test_tokenizer.py,
tests/test_convert.py).
"""

import types
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import ref_import  # noqa: E402

from rlipv2_tpu.config import (
    BackboneConfig,
    ModelConfig,
    TextEncoderConfig,
    TransformerConfig,
)
from rlipv2_tpu.engine.convert import convert_rlip_parseda, numpyify
from rlipv2_tpu.models.parseda import RLIPParSeDA

B, H, W = 2, 128, 128
NQ, ENC, DEC = 8, 4, 2
N_OBJ, N_PRED = 4, 4
T = N_OBJ + N_PRED


def _frozen_bn(n):
    ddb = ref_import.load("models.DDETR_backbone")
    return ddb.FrozenBatchNorm2d(n)


class _Bottleneck(nn.Module):
    """torchvision-key-space bottleneck (conv1/bn1..conv3/bn3 +
    downsample.0/.1) so engine.convert.convert_resnet maps it directly."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = _frozen_bn(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = _frozen_bn(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _frozen_bn(planes * 4)
        self.downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
            _frozen_bn(planes * 4),
        )

    def forward(self, x):
        y = TF.relu(self.bn1(self.conv1(x)))
        y = TF.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return TF.relu(y + self.downsample(x))


class _TinyResNet(nn.Module):
    """1-block-per-stage torchvision-style ResNet == our `resnet_test`."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = _frozen_bn(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(_Bottleneck(64, 64, 1))
        self.layer2 = nn.Sequential(_Bottleneck(256, 128, 2))
        self.layer3 = nn.Sequential(_Bottleneck(512, 256, 2))
        self.layer4 = nn.Sequential(_Bottleneck(1024, 512, 2))

    def forward(self, x):
        x = self.maxpool(TF.relu(self.bn1(self.conv1(x))))
        l1 = self.layer1(x)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        l4 = self.layer4(l3)
        return l2, l3, l4


class _BackboneWrapper(nn.Module):
    """BackboneBase-shaped wrapper: `.body` holds the resnet (so state-dict
    keys read backbone.0.body.*), forward returns {name: NestedTensor}
    with interpolated masks (reference models/DDETR_backbone.py:89-97)."""

    def __init__(self):
        super().__init__()
        self.body = _TinyResNet()
        self.strides = [8, 16, 32]
        self.num_channels = [512, 1024, 2048]

    def forward(self, tensor_list):
        misc = __import__("util.misc", fromlist=["NestedTensor"])
        feats = self.body(tensor_list.tensors)
        out = OrderedDict()
        for name, x in zip("012", feats):
            m = tensor_list.mask
            mask = TF.interpolate(m[None].float(), size=x.shape[-2:]).to(torch.bool)[0]
            out[name] = misc.NestedTensor(x, mask)
        return out


def _fusion_args():
    return types.SimpleNamespace(
        fusion_type="GLIP_attn",
        num_feature_levels=4,
        text_encoder_type="roberta-base",
        fusion_interval=2,
        fusion_last_vis=True,
        lang_aux_loss=True,
        separate_bidirectional=False,
        do_lang_proj_outside_checkpoint=False,
        gating_mechanism="VXAc",
        stable_softmax_2d=False,
        clamp_min_for_underflow=True,
        clamp_max_for_overflow=True,
        use_checkpoint_fusion=False,
        verb_query_tgt_type="vanilla_MBF",
    )


def _build_torch_model():
    import transformers

    dab = ref_import.load("models.dab_deformable.deformable_transformer")
    hoi = ref_import.load("models.hoi")
    ddb = ref_import.load("models.DDETR_backbone")
    pe = ref_import.load("models.position_encoding")

    # offline: random 1-layer RoBERTa, no tokenizer (the forward uses the
    # pre-encoded eval text branch)
    small_cfg = transformers.RobertaConfig(
        num_hidden_layers=1, layer_norm_eps=1e-5
    )
    orig = (dab.RobertaModel, dab.RobertaTokenizerFast, dab.RobertaConfig)
    dab.RobertaModel = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: transformers.RobertaModel(small_cfg)
    )
    dab.RobertaTokenizerFast = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: None
    )
    dab.RobertaConfig = types.SimpleNamespace(
        from_pretrained=lambda *a, **k: transformers.RobertaConfig(
            layer_norm_eps=1e-5
        )
    )
    try:
        torch.manual_seed(0)
        args = _fusion_args()
        transformer = dab.RLIP_ParSeDABDeformableTransformer_v2(
            d_model=256, nhead=8, num_encoder_layers=ENC,
            num_decoder_layers=DEC, dim_feedforward=1024, dropout=0.0,
            activation="relu", return_intermediate_dec=True,
            num_feature_levels=4, dec_n_points=4, enc_n_points=4,
            two_stage=False, use_dab=True, args=args,
        )
    finally:
        dab.RobertaModel, dab.RobertaTokenizerFast, dab.RobertaConfig = orig

    backbone = ddb.Joiner(
        _BackboneWrapper(), pe.PositionEmbeddingSine(128, normalize=True)
    )
    model = hoi.RLIP_ParSeDA(
        backbone, transformer, num_queries=NQ, num_feature_levels=4,
        aux_loss=True, with_box_refine=True, two_stage=False, use_dab=True,
        num_patterns=0, random_refpoints_xy=False, subject_class=False,
        pseudo_verb=False, args=args,
    )
    # randomize FrozenBN buffers so the scale/bias fold is non-trivial
    gen = torch.Generator().manual_seed(1)
    for name, buf in model.named_buffers():
        if "running_mean" in name:
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
        elif "running_var" in name:
            buf.copy_(torch.rand(buf.shape, generator=gen) * 0.5 + 0.75)
        elif name.endswith("bn1.weight") or "bn" in name and name.endswith(".weight"):
            buf.copy_(1.0 + torch.randn(buf.shape, generator=gen) * 0.1)
        elif "bn" in name and name.endswith(".bias"):
            buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
    model.eval()
    return model


def test_rlip_parseda_full_model_matches_reference():
    ref_import.install_stubs()  # puts /root/reference on sys.path
    misc = __import__("util.misc", fromlist=["NestedTensor"])
    model_t = _build_torch_model()

    rng = np.random.RandomState(0)
    imgs = rng.randn(B, 3, H, W).astype(np.float32)
    text768 = rng.randn(T, B, 768).astype(np.float32)
    sums = torch.tensor([[N_OBJ, N_PRED]] * B)

    samples = misc.NestedTensor(
        torch.tensor(imgs), torch.zeros(B, H, W, dtype=torch.bool)
    )
    with torch.no_grad():
        cache = model_t(
            samples, encode_and_save=True,
            text=(
                torch.zeros(T, B, dtype=torch.bool),
                torch.tensor(text768),
                sums,
            ),
        )
        out_t = model_t(samples, encode_and_save=False, memory_cache=cache)

    cfg = ModelConfig(
        backbone=BackboneConfig(name="resnet_test", num_outputs=3),
        text_encoder=TextEncoderConfig(num_layers=1),
        transformer=TransformerConfig(
            enc_layers=ENC, dec_layers=DEC, dropout=0.0
        ),
        num_queries=NQ, max_obj_texts=N_OBJ, max_verb_texts=N_PRED,
        dtype="float32",
    )
    params = convert_rlip_parseda(numpyify(model_t.state_dict()), cfg)

    out_j = RLIPParSeDA(cfg).apply(
        {"params": params},
        jnp.asarray(np.transpose(imgs, (0, 2, 3, 1))),
        jnp.ones((B, H, W), bool),
        jnp.asarray(np.transpose(text768, (1, 0, 2))),
        jnp.ones((B, T), bool),
        N_OBJ,
    )

    for key in ("pred_obj_logits", "pred_verb_logits", "pred_sub_boxes",
                "pred_obj_boxes"):
        np.testing.assert_allclose(
            np.asarray(out_j[key]), out_t[key].numpy(), atol=1e-3,
            err_msg=key,
        )
    assert len(out_j["aux_outputs"]) == len(out_t["aux_outputs"]) == DEC - 1
    for l, (aj, at) in enumerate(zip(out_j["aux_outputs"], out_t["aux_outputs"])):
        for key in ("pred_obj_logits", "pred_verb_logits", "pred_sub_boxes",
                    "pred_obj_boxes"):
            np.testing.assert_allclose(
                np.asarray(aj[key]), at[key].numpy(), atol=1e-3,
                err_msg=f"aux[{l}].{key}",
            )
