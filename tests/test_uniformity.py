"""Uniformity/alignment analysis metrics."""

import numpy as np

from rlipv2_tpu.tools.uniformity import alignment, analyze, uniformity


def test_uniformity_ordering():
    rng = np.random.RandomState(0)
    spread = rng.randn(200, 16)  # ~uniform on sphere after normalize
    clustered = rng.randn(200, 16) * 0.01 + np.ones(16)  # one tight cluster
    assert uniformity(spread) < uniformity(clustered)  # more negative = better


def test_alignment_ordering():
    rng = np.random.RandomState(1)
    tight = {c: rng.randn(1, 8) + rng.randn(10, 8) * 0.01 for c in range(5)}
    loose = {c: rng.randn(10, 8) for c in range(5)}
    assert alignment(tight) < alignment(loose)


def test_analyze():
    rng = np.random.RandomState(2)
    cf = {c: rng.randn(6, 8) for c in range(3)}
    out = analyze(cf)
    assert out["n_classes"] == 3 and out["n_features"] == 18
    assert np.isfinite(out["uniformity"]) and np.isfinite(out["alignment"])
