"""Shared loader for reference torch modules used as test oracles.

Registers the reference `models` package under its real name with stubs
for the heavy/unavailable dependencies (torchvision, timm, the compiled
MultiScaleDeformableAttention CUDA extension — replaced by the
reference's own pytorch core so forwards run on CPU), plus version shims
for the installed transformers. Oracle USE only — no reference code is
copied."""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _stub(name):
    mod = types.ModuleType(name)
    mod.__path__ = []
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
    sys.modules.setdefault(name, mod)
    return sys.modules[name]


def install_stubs():
    import torch

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    import transformers.modeling_utils as mu
    from transformers.pytorch_utils import (
        apply_chunking_to_forward,
        find_pruneable_heads_and_indices,
        prune_linear_layer,
    )

    mu.find_pruneable_heads_and_indices = find_pruneable_heads_and_indices
    mu.prune_linear_layer = prune_linear_layer
    mu.apply_chunking_to_forward = apply_chunking_to_forward

    tv = _stub("torchvision")
    tv.__version__ = "0.15.0"
    tvo = _stub("torchvision.ops")
    tvo.RoIAlign = type("RoIAlign", (), {})
    tvo.DeformConv2d = type("DeformConv2d", (), {})
    tvo.deform_conv2d = lambda *a, **k: None
    _stub("torchvision.ops.boxes").box_area = lambda b: None
    _stub("torchvision.ops.misc").FrozenBatchNorm2d = type(
        "FrozenBatchNorm2d", (torch.nn.Module,), {}
    )
    _stub("torchvision.models")
    _stub("torchvision.models._utils").IntermediateLayerGetter = type(
        "IntermediateLayerGetter", (dict,), {}
    )
    rn = _stub("torchvision.models.resnet")
    rn.ResNet = type("ResNet", (torch.nn.Module,), {})
    rn.Bottleneck = type("Bottleneck", (torch.nn.Module,), {})
    rn.resnet50 = lambda **k: None
    rn.resnet101 = lambda **k: None
    _stub("torchvision.transforms")
    tml = _stub("timm.models.layers")
    _stub("timm")
    _stub("timm.models")
    tml.DropPath = torch.nn.Identity
    tml.to_2tuple = lambda x: (x, x)
    tml.trunc_normal_ = lambda *a, **k: None
    _stub("MultiScaleDeformableAttention")

    # register the reference `models` package under its real name so the
    # absolute/relative imports inside it resolve
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [REF_ROOT + "/models"]
        pkg.__spec__ = importlib.machinery.ModuleSpec(
            "models", None, is_package=True
        )
        pkg.__spec__.submodule_search_locations = [REF_ROOT + "/models"]
        sys.modules["models"] = pkg


def load(name: str):
    """Import `models.<name>` (or any dotted reference module) with stubs
    installed; the CUDA MSDA functional is patched to the reference's
    pytorch core on first load."""
    install_stubs()
    mod = importlib.import_module(name)
    _patch_msda()
    return mod


def _patch_msda():
    stub = sys.modules["MultiScaleDeformableAttention"]
    if getattr(stub, "_patched", False):
        return
    try:
        func_mod = importlib.import_module(
            "models.ops.functions.ms_deform_attn_func"
        )
    except Exception:
        return
    core = func_mod.ms_deform_attn_core_pytorch

    def fwd(value, spatial_shapes, level_start_index, loc, attn, step):
        return core(value, spatial_shapes, loc, attn)

    stub.ms_deform_attn_forward = fwd
    stub._patched = True
