"""Committed torch-oracle golden pack: full-model output fidelity locked
WITHOUT torch or the reference checkout (VERDICT r4 next #7).

The fixture (tests/fixtures/golden_pack.npz, built once by
tools/make_golden_pack.py) carries the torch reference outputs and a
manifest from which the weights regenerate deterministically; this test
runs the whole torch-free path: synth weights -> engine.convert ->
RLIPParSeDA -> compare. It must keep passing on a machine with neither
torch nor /root/reference present."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from rlipv2_tpu.tools.golden_pack import (  # noqa: E402
    PACK_PATH,
    check_pack,
    load_pack,
    synth_state_dict,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(PACK_PATH), reason="golden pack not generated"
)


def test_synth_state_dict_deterministic():
    _, manifest = load_pack()
    a = synth_state_dict(manifest["names"], manifest["shapes"],
                         manifest["dtypes"], seed=int(manifest["seed"]))
    b = synth_state_dict(manifest["names"], manifest["shapes"],
                         manifest["dtypes"], seed=int(manifest["seed"]))
    assert list(a) == list(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # positivity of frozen-BN variances (the scale/bias fold divides)
    for k, v in a.items():
        if k.endswith("running_var"):
            assert (v > 0).all(), k


def test_golden_pack_output_parity():
    report = check_pack()
    # the live parity suite holds 1e-3; the frozen pack allows 2e-3 of
    # cross-version numerical drift headroom
    worst = max(report.values())
    assert worst <= 2e-3, report
