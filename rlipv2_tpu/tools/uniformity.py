"""Embedding uniformity / alignment analysis.

Capability parity with the reference's representation analysis
(analysis/uniformity.py + engine.evaluate_hoi_with_text_matching_uniformity,
engine.py:573-697): given per-class verb feature collections (e.g. matched
decoder outputs dumped during eval), compute the Wang & Isola (2020)
uniformity and alignment metrics used in the RLIPv2 paper's analysis.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def uniformity(features: np.ndarray, t: float = 2.0) -> float:
    """log E[exp(-t * ||x - y||^2)] over all pairs of L2-normalized
    features; more negative = more uniform on the hypersphere."""
    x = _normalize(np.asarray(features, np.float64))
    sq = (
        np.sum(x**2, -1)[:, None]
        + np.sum(x**2, -1)[None, :]
        - 2.0 * x @ x.T
    )
    n = len(x)
    mask = ~np.eye(n, dtype=bool)
    return float(np.log(np.mean(np.exp(-t * sq[mask]))))


def alignment(class_features: Mapping, alpha: float = 2.0) -> float:
    """E[||x - y||^alpha] over positive (same-class) pairs."""
    dists = []
    for feats in class_features.values():
        x = _normalize(np.asarray(feats, np.float64))
        if len(x) < 2:
            continue
        sq = (
            np.sum(x**2, -1)[:, None]
            + np.sum(x**2, -1)[None, :]
            - 2.0 * x @ x.T
        )
        iu = np.triu_indices(len(x), 1)
        dists.append(np.maximum(sq[iu], 0.0) ** (alpha / 2.0))
    if not dists:
        return 0.0
    return float(np.mean(np.concatenate(dists)))


def analyze(class_features: Mapping) -> dict:
    """-> {'uniformity': float, 'alignment': float, 'n_classes': int}."""
    all_feats = np.concatenate(
        [np.asarray(v) for v in class_features.values() if len(v)]
    )
    return {
        "uniformity": uniformity(all_feats),
        "alignment": alignment(class_features),
        "n_classes": len(class_features),
        "n_features": len(all_feats),
    }
