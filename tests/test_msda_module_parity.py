"""MSDeformAttention MODULE parity vs the reference torch module
(models/ops/modules/ms_deform_attn.py:82-119 with the CUDA functional
replaced by the reference's own pytorch core): covers the offset /
attention-weight projections, the 2-d offset normalizer and the 4-d
anchor-scaled offsets, value masking, and the converter's `_msda`
key mapping. The kernel itself is oracle-tested separately
(tests/test_ms_deform_attn.py, tests/test_msda_v4.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import ref_import  # noqa: E402

from rlipv2_tpu.engine.convert import _msda
from rlipv2_tpu.models.layers import MSDeformAttention

SHAPES = ((6, 8), (3, 4), (2, 2), (1, 1))
D = 256


def _build(seed):
    mm = ref_import.load("models.ops.modules.ms_deform_attn")
    torch.manual_seed(seed)
    mod = mm.MSDeformAttn(d_model=D, n_levels=4, n_heads=8, n_points=4)
    # random weights everywhere EXCEPT the canonical offset init (the
    # module's _reset_parameters already set the grid bias; perturb the
    # projections so the test is not trivially zero)
    with torch.no_grad():
        for name in ("value_proj", "output_proj", "attention_weights"):
            getattr(mod, name).weight.normal_(0, 0.05)
            getattr(mod, name).bias.normal_(0, 0.05)
        mod.sampling_offsets.weight.normal_(0, 0.02)
    mod.eval()
    return mod


@pytest.mark.parametrize("ref_dim", [2, 4])
def test_msda_module_matches_reference(ref_dim):
    mod = _build(ref_dim)
    rng = np.random.RandomState(ref_dim)
    B, Q = 2, 9
    S = sum(h * w for h, w in SHAPES)
    query = rng.randn(B, Q, D).astype(np.float32)
    value = rng.randn(B, S, D).astype(np.float32)
    valid = np.ones((B, S), bool)
    valid[0, 40:48] = False
    refs = rng.uniform(0.2, 0.8, (B, Q, 4, ref_dim)).astype(np.float32)

    shapes_t = torch.tensor(SHAPES, dtype=torch.long)
    lsi = torch.tensor(
        np.cumsum([0] + [h * w for h, w in SHAPES])[:-1], dtype=torch.long
    )
    with torch.no_grad():
        out_t = mod(
            torch.tensor(query),
            torch.tensor(refs),
            torch.tensor(value),
            shapes_t,
            lsi,
            input_padding_mask=torch.tensor(~valid),
        ).numpy()

    sd = {"x." + k: v.detach().numpy() for k, v in mod.state_dict().items()}
    params = _msda(sd, "x")
    ours = MSDeformAttention(
        d_model=D, n_levels=4, n_heads=8, n_points=4, dtype=jnp.float32,
        impl="xla",
    )
    out_j = ours.apply(
        {"params": params},
        jnp.asarray(query),
        jnp.asarray(refs),
        jnp.asarray(value),
        SHAPES,
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t, atol=2e-5, err_msg=f"ref_dim={ref_dim}"
    )
