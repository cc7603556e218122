"""Pseudo-verb soft labels and hard-negative text mining."""

import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.data.text import sample_negative_texts_hard
from rlipv2_tpu.losses.pseudo_verb import pseudo_verb_similarity


def test_pseudo_verb_properties():
    rng = np.random.RandomState(0)
    Tv, D, B, M = 6, 8, 2, 3
    feats = jnp.asarray(rng.randn(Tv, D).astype(np.float32))
    labels = np.zeros((B, M, Tv), np.float32)
    labels[0, 0, 1] = 1.0
    labels[0, 1, [2, 3]] = 1.0
    valid = jnp.ones(Tv, bool)
    out = np.asarray(pseudo_verb_similarity(feats, jnp.asarray(labels), valid))
    assert out.shape == (B, M, Tv)
    assert (out >= 0).all() and (out <= 1).all()
    # GT verbs zeroed
    assert out[0, 0, 1] == 0 and out[0, 1, 2] == 0 and out[0, 1, 3] == 0
    # rows with no labels produce all-zero soft labels
    assert (out[1] == 0).all()
    # thresholding: all nonzero entries > 0.3
    nz = out[out > 0]
    assert (nz > 0.3).all() if len(nz) else True


def test_pseudo_verb_identical_features_max_sim():
    """A verb with features identical to a GT verb gets the top score."""
    rng = np.random.RandomState(1)
    Tv, D = 5, 8
    f = rng.randn(Tv, D).astype(np.float32)
    f[3] = f[1]  # verb 3 ~ verb 1
    labels = np.zeros((1, 1, Tv), np.float32)
    labels[0, 0, 1] = 1.0
    out = np.asarray(
        pseudo_verb_similarity(jnp.asarray(f), jnp.asarray(labels), jnp.ones(Tv, bool))
    )
    assert out[0, 0, 3] == out[0, 0].max() > 0


def test_hard_negative_mining_ranks_similar_first():
    rng = np.random.RandomState(2)
    vocab = [f"t{i}" for i in range(20)]
    feats = rng.randn(20, 16).astype(np.float32)
    feats[7] = feats[0] + 0.01  # t7 most similar to t0
    merged = ["t0"]
    out = sample_negative_texts_hard(merged, 3, vocab, feats)
    assert len(out) == 3
    assert out[0] == "t0"
    assert out[1] == "t7"  # hardest negative first


def test_hard_negative_mining_degrades_gracefully():
    out = sample_negative_texts_hard(
        ["unknown"], 3, ["a", "b"], np.eye(2, dtype=np.float32)
    )
    assert out == ["unknown"]  # no valid queries -> caller falls back
