"""Cross-process evaluation protocol: strided shard + fixed-shape gather +
image-id dedupe must reproduce the single-process mAP exactly
(reference: engine.py:326-329, :439-453, util/misc.py:102-143)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.engine.loops import evaluate_hoi
from rlipv2_tpu.parallel.dist_eval import (
    DistEvalBuffer,
    pad_gt_arrays,
    shard_indices,
    unpack_gt_arrays,
)
from test_data_pipeline import synth_hico  # noqa: F401
from test_engine_loops import remap_small, small_vocab_dataset, tiny_setup  # noqa: F401

pytest.importorskip("PIL")


def test_shard_indices_cover_and_balance():
    n, world = 10, 4
    shards = [shard_indices(n, r, world) for r in range(world)]
    assert all(len(s) == 3 for s in shards)  # ceil(10/4)
    covered = set()
    for s in shards:
        covered.update(s)
    assert covered == set(range(n))
    assert shard_indices(n, 0, 1) == list(range(n))


def test_buffer_gather_dedupe_roundtrip():
    world = 3
    # simulate ranks: each adds its strided shard of 7 images with a
    # payload derived from the image index
    buffers = [DistEvalBuffer() for _ in range(world)]
    n = 7
    for r in range(world):
        ids = shard_indices(n, r, world)
        payload = {"x": np.stack([np.full((2,), i, np.float32) for i in ids])}
        buffers[r].add(np.asarray(ids), payload)

    locals_ = [b._local() for b in buffers]

    def fake_gather(tree):
        # stack the corresponding local trees across "processes"
        stacked = {}
        for k in tree:
            stacked[k] = np.stack(
                [t[1][k] if k != "_ids" else t[0] for t in locals_]
            )
        return stacked

    ids, tree = buffers[0].gather_and_dedupe(fake_gather)
    assert ids.tolist() == list(range(n))
    assert tree["x"].shape == (n, 2)
    np.testing.assert_array_equal(tree["x"][:, 0], np.arange(n))


def test_pad_unpack_gt_roundtrip():
    gts = [
        {"boxes": np.ones((2, 4)), "labels": np.asarray([1, 2]),
         "hois": np.asarray([[0, 1, 3]])},
        {"boxes": np.zeros((0, 4)), "labels": np.zeros((0,)),
         "hois": np.zeros((0, 3))},
    ]
    packed = pad_gt_arrays(gts, max_boxes=4, max_hois=4)
    out = unpack_gt_arrays(packed)
    assert out[0]["boxes"].shape == (2, 4)
    assert out[0]["hois"].tolist() == [[0, 1, 3]]
    assert out[1]["boxes"].shape == (0, 4)


def test_sharded_eval_matches_single_process(tiny_setup, synth_hico):  # noqa: F811
    """4 simulated ranks -> identical mAP to the single-process eval."""
    cfg, model, params, text_encoder = tiny_setup
    val_ds = small_vocab_dataset(synth_hico, train=False)
    remap_small(val_ds)
    val_ds.rare_triplets = []
    val_ds.non_rare_triplets = []

    apply_fn = jax.jit(
        lambda p, px, v, te, tv, n: model.apply(p, px, v, te, tv, n),
        static_argnums=(5,),
    )
    kwargs = dict(
        batch_size=2, bucket=(512, 512), max_images=4,
        max_gt_boxes=16, max_gt_hois=16,
    )
    single = evaluate_hoi(
        apply_fn, params, val_ds, cfg, text_encoder, **kwargs
    )

    # run each simulated rank's shard loop, capturing its local buffers
    world = 4
    captured = []

    def capturing_gather(tree):
        captured.append(tree)
        raise _StopGather()

    class _StopGather(Exception):
        pass

    for r in range(world):
        try:
            evaluate_hoi(
                apply_fn, params, val_ds, cfg, text_encoder,
                rank=r, world=world, gather_fn=capturing_gather, **kwargs
            )
        except _StopGather:
            pass
    assert len(captured) == world

    def real_gather(tree):
        return {k: np.stack([c[k] for c in captured]) for k in tree}

    multi = evaluate_hoi(
        apply_fn, params, val_ds, cfg, text_encoder,
        rank=0, world=world, gather_fn=real_gather, **kwargs
    )
    assert multi == pytest.approx(single)
