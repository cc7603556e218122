"""postprocess_hoi vs a numpy re-derivation of PostProcessHOI semantics."""

import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.eval.postprocess import postprocess_hoi, to_image_results


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_postprocess_matches_reference_semantics():
    rng = np.random.RandomState(0)
    B, nq, To, Tv = 2, 6, 5, 4
    outputs = {
        "pred_obj_logits": jnp.asarray(rng.randn(B, nq, To).astype(np.float32)),
        "pred_verb_logits": jnp.asarray(rng.randn(B, nq, Tv).astype(np.float32)),
        "pred_sub_boxes": jnp.asarray(rng.uniform(0.2, 0.6, (B, nq, 4)).astype(np.float32)),
        "pred_obj_boxes": jnp.asarray(rng.uniform(0.2, 0.6, (B, nq, 4)).astype(np.float32)),
    }
    sizes = jnp.asarray([[480, 640], [320, 400]], dtype=jnp.float32)
    out = postprocess_hoi(outputs, sizes)

    op = softmax(np.asarray(outputs["pred_obj_logits"]))[..., :-1]
    np.testing.assert_allclose(np.asarray(out["obj_scores"]), op.max(-1), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["obj_labels"]), op.argmax(-1))
    vs = 1 / (1 + np.exp(-np.asarray(outputs["pred_verb_logits"])))
    vs = vs * op.max(-1)[..., None]
    np.testing.assert_allclose(np.asarray(out["verb_scores"]), vs, atol=1e-5)

    # boxes scaled to original size, xyxy
    b = np.asarray(outputs["pred_sub_boxes"][0, 0])
    xyxy = np.array(
        [b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2]
    ) * np.array([640, 480, 640, 480])
    np.testing.assert_allclose(np.asarray(out["sub_boxes"][0, 0]), xyxy, atol=1e-3)

    results = to_image_results(out, subject_category_id=0)
    assert len(results) == B
    assert results[0]["labels"].shape == (2 * nq,)
    assert (results[0]["labels"][:nq] == 0).all()
    assert results[0]["verb_scores"].shape == (nq, Tv)


def test_padded_slots_inert():
    """Padded obj/verb text slots must not win argmax or contribute scores."""
    rng = np.random.RandomState(1)
    B, nq, To, Tv = 1, 4, 6, 5
    obj_logits = rng.randn(B, nq, To).astype(np.float32)
    obj_logits[..., 3] = 50.0  # huge logit in a PADDED slot
    verb_logits = rng.randn(B, nq, Tv).astype(np.float32)
    verb_logits[..., 4] = 50.0  # padded verb slot
    outputs = {
        "pred_obj_logits": jnp.asarray(obj_logits),
        "pred_verb_logits": jnp.asarray(verb_logits),
        "pred_sub_boxes": jnp.full((B, nq, 4), 0.5, jnp.float32),
        "pred_obj_boxes": jnp.full((B, nq, 4), 0.5, jnp.float32),
    }
    ov = np.ones((B, To), bool)
    ov[0, 3] = False
    vv = np.ones((B, Tv), bool)
    vv[0, 4] = False
    out = postprocess_hoi(
        outputs, jnp.asarray([[100.0, 100.0]]), jnp.asarray(ov), jnp.asarray(vv)
    )
    assert (np.asarray(out["obj_labels"]) != 3).all()
    assert np.asarray(out["verb_scores"])[..., 4].max() == 0.0
