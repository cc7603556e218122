"""OCN semantic-reasoning blocks vs the reference torch implementations
(models/hoi.py imported as oracle with stubbed heavy deps): count_fusion,
SemanticGraph (embedded_dot_pro), bilinear TransformerLayer, GC-like
MHCrossAttLayer — weights copied torch -> flax, outputs matched."""

import importlib.machinery
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _load_ref_hoi():
    if "refmodels.hoi" in sys.modules:
        return sys.modules["refmodels.hoi"]
    sys.path.insert(0, "/root/reference")
    import transformers.modeling_utils as mu
    from transformers.pytorch_utils import (
        apply_chunking_to_forward,
        find_pruneable_heads_and_indices,
        prune_linear_layer,
    )

    mu.find_pruneable_heads_and_indices = find_pruneable_heads_and_indices
    mu.prune_linear_layer = prune_linear_layer
    mu.apply_chunking_to_forward = apply_chunking_to_forward
    names = [
        "torchvision", "torchvision.ops", "torchvision.ops.boxes",
        "torchvision.models", "torchvision.models._utils",
        "torchvision.models.resnet", "torchvision.transforms",
        "torchvision.ops.misc", "MultiScaleDeformableAttention",
        "timm", "timm.models", "timm.models.layers",
    ]
    for name in names:
        mod = types.ModuleType(name)
        mod.__path__ = []
        mod.__spec__ = importlib.machinery.ModuleSpec(
            name, None, is_package=True
        )
        sys.modules.setdefault(name, mod)
    tv = sys.modules["torchvision"]
    tv.__version__ = "0.15.0"
    tvo = sys.modules["torchvision.ops"]
    tvo.RoIAlign = type("RoIAlign", (), {})
    tvo.DeformConv2d = type("DeformConv2d", (), {})
    tvo.deform_conv2d = lambda *a, **k: None
    sys.modules["torchvision.ops.misc"].FrozenBatchNorm2d = type(
        "FrozenBatchNorm2d", (torch.nn.Module,), {}
    )
    sys.modules["torchvision.ops.boxes"].box_area = lambda b: None
    sys.modules["torchvision.models._utils"].IntermediateLayerGetter = type(
        "IntermediateLayerGetter", (dict,), {}
    )
    rn = sys.modules["torchvision.models.resnet"]
    rn.ResNet = type("ResNet", (torch.nn.Module,), {})
    rn.Bottleneck = type("Bottleneck", (torch.nn.Module,), {})
    rn.resnet50 = lambda **k: None
    rn.resnet101 = lambda **k: None
    msda = sys.modules["MultiScaleDeformableAttention"]
    msda.ms_deform_attn_forward = lambda *a, **k: None
    msda.ms_deform_attn_backward = lambda *a, **k: None
    tml = sys.modules["timm.models.layers"]
    tml.DropPath = torch.nn.Identity
    tml.to_2tuple = lambda x: (x, x)
    tml.trunc_normal_ = lambda *a, **k: None

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = ["/root/reference/models"]
    sys.modules["refmodels"] = pkg
    spec = importlib.util.spec_from_file_location(
        "refmodels.hoi", "/root/reference/models/hoi.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["refmodels.hoi"] = m
    spec.loader.exec_module(m)
    return m


def _lin(linear):
    return (
        jnp.asarray(linear.weight.detach().numpy().T),
        jnp.asarray(linear.bias.detach().numpy()),
    )


def test_count_fusion_parity():
    ref = _load_ref_hoi()
    from rlipv2_tpu.models.closed_vocab import count_fusion

    rng = np.random.RandomState(0)
    x = rng.randn(4, 7).astype(np.float32)
    y = rng.randn(4, 7).astype(np.float32)
    want = ref.count_fusion(torch.tensor(x), torch.tensor(y)).numpy()
    got = np.asarray(count_fusion(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_semantic_graph_parity():
    ref = _load_ref_hoi()
    from rlipv2_tpu.models.closed_vocab import SemanticGraph

    torch.manual_seed(0)
    tg = ref.SemanticGraph(300, 256, 1, attention_type="embedded_dot_pro")
    tg.eval()
    rng = np.random.RandomState(1)
    x = rng.randn(17, 300).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.tensor(x)).numpy()

    ours = SemanticGraph(256, 1)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = params["params"]
    kq, bq = _lin(tg.semantic_q[0])
    kk, bk = _lin(tg.semantic_k[0])
    kv, bv = _lin(tg.semantic_v[0])
    kr, br = _lin(tg.semantic_proj_res)
    p = dict(p)
    p["semantic_q_0"] = {"kernel": kq, "bias": bq}
    p["semantic_k_0"] = {"kernel": kk, "bias": bk}
    p["semantic_v_0"] = {"kernel": kv, "bias": bv}
    p["semantic_proj_res"] = {"kernel": kr, "bias": br}
    got = np.asarray(ours.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_bilinear_transformer_layer_parity():
    ref = _load_ref_hoi()
    from rlipv2_tpu.models.closed_vocab import _BilinearTransformerLayer

    torch.manual_seed(1)
    tl = ref.TransformerLayer(64, nheads=2, relation="bilinear")
    tl.eval()
    rng = np.random.RandomState(2)
    x = rng.randn(2, 1, 5, 64).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.tensor(x)).numpy()

    ours = _BilinearTransformerLayer(64, 2)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = dict(params["params"])
    for i in range(2):
        k1, b1 = _lin(tl.bilinear1[i])
        k2, b2 = _lin(tl.bilinear2[i])
        k3, b3 = _lin(tl.W3[i])
        p[f"bilinear1_{i}"] = {"kernel": k1, "bias": b1}
        p[f"bilinear2_{i}"] = {"kernel": k2, "bias": b2}
        p[f"W3_{i}"] = {"kernel": k3, "bias": b3}
        p[f"coef_{i}"] = jnp.asarray(tl.coef[i].detach().numpy())
    kw2, bw2 = _lin(tl.W2)
    kw1, bw1 = _lin(tl.W1)
    p["W2"] = {"kernel": kw2, "bias": bw2}
    p["W1"] = {"kernel": kw1, "bias": bw1}
    p["ln"] = {
        "scale": jnp.asarray(tl.LayerNorm.weight.detach().numpy()),
        "bias": jnp.asarray(tl.LayerNorm.bias.detach().numpy()),
    }
    got = np.asarray(ours.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mh_cross_att_layer_parity():
    ref = _load_ref_hoi()
    from rlipv2_tpu.models.closed_vocab import _MHCrossAttLayer

    torch.manual_seed(2)
    tl = ref.MHCrossAttLayer(64, nheads=2, relation="GClike")
    tl.eval()
    rng = np.random.RandomState(3)
    vx = rng.randn(2, 1, 5, 64).astype(np.float32)
    sx = rng.randn(2, 1, 5, 64).astype(np.float32)
    with torch.no_grad():
        want_v, want_s = tl(torch.tensor(vx), torch.tensor(sx))
        want_v, want_s = want_v.numpy(), want_s.numpy()

    ours = _MHCrossAttLayer(64, 2)
    params = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(vx), jnp.asarray(sx)
    )
    p = dict(params["params"])
    for tag, tsub in (("vision", "vision"), ("semantic", "semantic")):
        for i in range(2):
            for ours_n, ref_list in (
                (f"{tag}_sq_{i}", getattr(tl, f"{tsub}_sq")),
                (f"{tag}_ex_{i}", getattr(tl, f"{tsub}_ex")),
                (f"{tag}_W3_{i}", getattr(tl, f"{tsub}_W3")),
            ):
                k, b = _lin(ref_list[i])
                p[ours_n] = {"kernel": k, "bias": b}
        k2, b2 = _lin(getattr(tl, f"{tsub}_W2"))
        k1, b1 = _lin(getattr(tl, f"{tsub}_W1"))
        ln = getattr(tl, f"{tsub}_LayerNorm")
        p[f"{tag}_W2"] = {"kernel": k2, "bias": b2}
        p[f"{tag}_W1"] = {"kernel": k1, "bias": b1}
        p[f"{tag}_ln"] = {
            "scale": jnp.asarray(ln.weight.detach().numpy()),
            "bias": jnp.asarray(ln.bias.detach().numpy()),
        }
    got_v, got_s = ours.apply(
        {"params": p}, jnp.asarray(vx), jnp.asarray(sx)
    )
    np.testing.assert_allclose(np.asarray(got_v), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_s), want_s, atol=2e-5)
