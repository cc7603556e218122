"""Pseudo-verb soft labels (RPL companion).

Capability parity with RLIP_ParSeDA's online pseudo_verb generation
(reference: models/hoi.py:2197-2239): inter-verb similarity from the
PRE-FUSION pooled text features via pairwise Euclidean distance
(sim = rowmax(dist) - dist), aggregated over each GT triplet's positive
verbs, max-normalized, GT verbs zeroed, and thresholded at 0.3. The result
feeds SetCriterionHOI's `target_verb_sim` (added to verb labels before the
GIoU scaling in `_verb_loss`, reference :3970-3975).
"""

from __future__ import annotations

import jax.numpy as jnp

SIM_THRESHOLD = 0.3


def pseudo_verb_similarity(
    verb_text_features: jnp.ndarray,  # (Tv, D) verb text features
    verb_labels: jnp.ndarray,  # (B, M, Tv) multi-hot GT
    verb_valid: jnp.ndarray,  # (Tv,) or (B, Tv) valid verb slots
    threshold: float = SIM_THRESHOLD,
    metric: str = "euclidean",
) -> jnp.ndarray:
    """-> (B, M, Tv) soft pseudo labels in [0, 1].

    metric='euclidean' is the ONLINE mode (features = the current
    forward's post-ALIF language states; sim = rowmax(dist) - dist,
    reference: models/hoi.py:2197-2207); metric='cosine' is the OFFLINE
    mode (precomputed L2-normalized text features, reference :2209-2216)."""
    if verb_valid.ndim == 2:
        verb_valid = verb_valid[0]
    f = verb_text_features.astype(jnp.float32)
    pair_valid = verb_valid[None, :] & verb_valid[:, None]
    if metric == "euclidean":
        d2 = (
            jnp.sum(f**2, -1)[:, None]
            + jnp.sum(f**2, -1)[None, :]
            - 2.0 * f @ f.T
        )
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))  # (Tv, Tv)
        big = jnp.where(pair_valid, dist, -jnp.inf)
        sim = big.max(-1, keepdims=True) - dist
    elif metric == "cosine":
        fn = f / jnp.maximum(
            jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12
        )
        sim = fn @ fn.T
    else:
        raise ValueError(metric)
    sim = jnp.where(pair_valid, sim, 0.0)

    labels = verb_labels.astype(jnp.float32)
    tvs = jnp.einsum("bmv,vw->bmw", labels, sim)
    denom = jnp.maximum(tvs.max(-1, keepdims=True), 1e-12)
    tvs = jnp.where(labels.sum(-1, keepdims=True) > 0, tvs / denom, tvs)
    tvs = jnp.where(labels > 0, 0.0, tvs)  # GT verbs stay hard
    return tvs * (tvs > threshold)
