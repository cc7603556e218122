"""Small shared layers vs their torch reference counterparts:
MultiBranchFusion (fuse_helper.py:755-798) with the converter's stacked
einsum mapping, and the sine position embeddings in both conventions
(models/position_encoding.py:22-60 plain, dab_deformable/
position_encoding.py with the -0.5 grid offset)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import ref_import  # noqa: E402

from rlipv2_tpu.engine.convert import _mbf
from rlipv2_tpu.models.layers import MultiBranchFusion
from rlipv2_tpu.ops.positional import sine_position_embedding


def test_mbf_matches_reference():
    fh = ref_import.load("models.fuse_helper")
    torch.manual_seed(0)
    mbf_t = fh.MultiBranchFusion(256, 256, 256, 16)
    mbf_t.eval()
    rng = np.random.RandomState(0)
    a = rng.randn(2, 7, 256).astype(np.float32)
    b = rng.randn(2, 7, 256).astype(np.float32)
    with torch.no_grad():
        want = mbf_t(torch.tensor(a), torch.tensor(b)).numpy()

    sd = {"m." + k: v.detach().numpy() for k, v in mbf_t.state_dict().items()}
    params = _mbf(sd, "m")
    ours = MultiBranchFusion(256, 16, dtype=jnp.float32)
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(a), jnp.asarray(b))
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("offset", [0.0, -0.5])
def test_sine_position_embedding_matches_reference(offset):
    mod_name = (
        "models.position_encoding" if offset == 0.0
        else "models.dab_deformable.position_encoding"
    )
    pe_mod = ref_import.load(mod_name)
    misc = ref_import.load("util.misc")
    pe_t = pe_mod.PositionEmbeddingSine(num_pos_feats=128, normalize=True)

    rng = np.random.RandomState(1)
    B, H, W = 2, 7, 9
    x = torch.tensor(rng.randn(B, 3, H, W).astype(np.float32))
    valid = np.ones((B, H, W), bool)
    valid[0, 5:, :] = False
    valid[0, :, 7:] = False
    nt = misc.NestedTensor(x, torch.tensor(~valid))
    with torch.no_grad():
        want = pe_t(nt).numpy()  # (B, 256, H, W)
    want = np.transpose(want, (0, 2, 3, 1))

    got = np.asarray(
        sine_position_embedding(
            jnp.asarray(valid), num_pos_feats=128, normalize=True,
            offset=offset,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
