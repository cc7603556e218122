"""R-Tagger training end-to-end: pair-sampling dataset, tagger train step,
CLI routing (VERDICT round-2 item 3) and multi-dataset pretraining
interleaving (item 4)."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rlipv2_tpu.config import LossConfig, TrainConfig
from rlipv2_tpu.data.pipeline import build_train_batch
from rlipv2_tpu.data.transforms import HOITransform
from rlipv2_tpu.data.vg import (
    VGRelDataset,
    VGRelTaggerDataset,
    batch_iterative_indices,
)
from rlipv2_tpu.engine import create_train_state, make_train_step
from rlipv2_tpu.engine.loops import CachedTextEncoder
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params

from test_parseda_forward import tiny_config
from test_vg_dataset import make_vg


def test_tagger_dataset_fills_pair_slots(tmp_path):
    """Positive GT pairs + sampled negatives fill num_queries//2 slots
    (reference VGRelTagger sampling, datasets/vg.py:479-490)."""
    anno_file, img_dir = make_vg(tmp_path)
    ds = VGRelTaggerDataset(
        anno_file, {"vg": img_dir},
        num_queries=8,  # 4 pair slots
        transforms=HOITransform(train=False, val_size=96),
        seed=0,
    )
    _, t = ds[0]
    # 2 positives (1->2 merged, 1->3) + negatives to fill 4 slots;
    # 3 boxes give 6 ordered pairs, so negatives exist
    n = len(t["obj_labels"])
    assert n == 4
    # exactly the last two rows are negatives: all-zero verb vectors
    assert (t["verb_labels"][:2].sum(axis=1) > 0).all()
    assert (t["verb_labels"][2:] == 0).all()
    # negative pairs reuse real kept boxes
    assert t["sub_boxes"].shape == (4, 4)

    # with tiny slot budget, positives are subsampled and no negatives
    ds2 = VGRelTaggerDataset(
        anno_file, {"vg": img_dir},
        num_queries=2,  # 1 pair slot
        transforms=HOITransform(train=False, val_size=96),
        seed=0,
    )
    _, t2 = ds2[0]
    assert len(t2["obj_labels"]) == 1


def _fake_text_encoder(dim):
    def encode(texts):
        out = []
        for t in texts:
            rng = np.random.RandomState(abs(hash(t)) % (2**31))
            out.append(rng.randn(dim).astype(np.float32))
        return np.stack(out)

    return CachedTextEncoder(encode)


def test_tagger_train_step_decreases_loss(tmp_path):
    """A few tagger steps on synthetic VG data reduce the loss (the
    DN-noised GT-query reconstruction objective is learnable)."""
    anno_file, img_dir = make_vg(tmp_path)
    cfg = dataclasses.replace(tiny_config(), subject_class=True)
    ds = VGRelTaggerDataset(
        anno_file, {"vg": img_dir},
        num_queries=cfg.num_queries,
        transforms=HOITransform(train=False, val_size=64),
        seed=0,
    )
    model = RLIPParSeDA(cfg)
    T = cfg.max_obj_texts + cfg.max_verb_texts
    params = init_model_params(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.ones((1, 64, 64), bool),
        jnp.zeros((1, T, cfg.text_encoder.hidden_size)),
        jnp.ones((1, T), bool), cfg.max_obj_texts,
        jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
        include_tagger=True,
    )
    tcfg = TrainConfig(ema=False, lr=1e-3)
    criterion = SetCriterionHOI(
        LossConfig(verb_loss_type="bce"), subject_class=True
    )
    state, tx = create_train_state(params, tcfg, steps_per_epoch=10)
    step = make_train_step(
        model, criterion, tx, cfg, tcfg, mesh=None, tagger=True,
        box_noise_scale=0.6, label_noise_scale=0.3,
    )

    import random

    enc = _fake_text_encoder(cfg.text_encoder.hidden_size)
    samples = [ds[i] for i in range(2)]
    arrays, obj_slots, verb_slots = build_train_batch(
        samples, cfg.max_obj_texts, cfg.max_verb_texts,
        max_triplets=cfg.num_queries // 2, rng=random.Random(0),
        bucket=(64, 96),
    )
    feats = enc([t if t else "." for t in list(obj_slots) + list(verb_slots)])
    from rlipv2_tpu.engine.loops import _batch_from_arrays

    text_valid = np.concatenate(
        [arrays["obj_text_valid"], arrays["verb_text_valid"]], axis=1
    )
    batch = _batch_from_arrays(
        arrays, np.tile(feats[None], (2, 1, 1)), text_valid
    )

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_cli_tagger_smoke(tmp_path, monkeypatch):
    """`--dataset_file vg --verb_tagger` routes and trains one step end to
    end (the round-2 verdict found scripts/tagger_train_vg.sh crashed on an
    unrouted --dataset_file vg)."""
    from rlipv2_tpu import cli
    from rlipv2_tpu.config import PRESETS
    import rlipv2_tpu.data.pipeline as pipeline
    import rlipv2_tpu.data.transforms as transforms_mod
    import rlipv2_tpu.engine.loops as loops_mod

    # 8 images / batch 8: the hermetic suite runs on an 8-device CPU mesh
    # and the data axis must divide the batch
    anno_file, img_dir = make_vg(tmp_path, n=8)
    cfg = dataclasses.replace(tiny_config(), subject_class=True)
    monkeypatch.setitem(PRESETS, "tiny_test", lambda: cfg)
    monkeypatch.setattr(
        loops_mod, "CachedTextEncoder",
        lambda fn: _fake_text_encoder(cfg.text_encoder.hidden_size),
    )
    monkeypatch.setattr(transforms_mod, "TRAIN_SCALES", [64])
    orig_make = pipeline.make_hoi_batch
    monkeypatch.setattr(
        pipeline, "make_hoi_batch",
        lambda imgs, tgts, mt, vs, bucket=None, **kw: orig_make(
            imgs, tgts, mt, vs, bucket=(128, 128)
        ),
    )

    cli.main([
        "--preset", "tiny_test", "--dataset_file", "vg", "--verb_tagger",
        "--verb_loss_type", "bce",
        "--pretrain_anno", str(anno_file), "--vg_folder", str(img_dir),
        "--epochs", "1", "--max_steps", "1", "--batch_size", "8",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert (tmp_path / "out" / "log.txt").exists()


def test_batch_iterative_grouping_matches_paradigm():
    """The pretraining grouping puts micro-batch k of every step on
    dataset paradigm[k] (reference BatchIterativeDistributedSampler +
    gradient accumulation, engine.py:138-165)."""
    sizes = [8, 6]
    paradigm = [0, 1]
    bs = 2
    batches = batch_iterative_indices(sizes, bs, paradigm, shuffle=True,
                                      seed=0, epoch=0)
    K = len(paradigm)
    groups = [
        batches[i : i + K]
        for i in range(0, len(batches) - K + 1, K)
        if all(len(b) == bs for b in batches[i : i + K])
    ]
    assert groups, "no complete groups"
    for g in groups:
        for k, micro in enumerate(g):
            if paradigm[k] == 0:
                assert all(i < sizes[0] for i in micro), (g, k)
            else:
                assert all(i >= sizes[0] for i in micro), (g, k)


def test_cli_pretrain_two_datasets_interleaved(tmp_path, monkeypatch):
    """run_pretrain over two annotation files: one optimizer step
    accumulates one micro-batch per dataset and completes."""
    from rlipv2_tpu import cli
    from rlipv2_tpu.config import PRESETS
    import rlipv2_tpu.data.pipeline as pipeline
    import rlipv2_tpu.data.transforms as transforms_mod
    import rlipv2_tpu.engine.loops as loops_mod

    anno_a, img_dir = make_vg(tmp_path, n=8)
    # second dataset: same images, separate annotation file
    anno_b = tmp_path / "annos_b.json"
    anno_b.write_text(anno_a.read_text())

    cfg = tiny_config()
    monkeypatch.setitem(PRESETS, "tiny_test", lambda: cfg)
    monkeypatch.setattr(
        loops_mod, "CachedTextEncoder",
        lambda fn: _fake_text_encoder(cfg.text_encoder.hidden_size),
    )
    monkeypatch.setattr(transforms_mod, "TRAIN_SCALES", [64])
    orig_make = pipeline.make_hoi_batch
    monkeypatch.setattr(
        pipeline, "make_hoi_batch",
        lambda imgs, tgts, mt, vs, bucket=None, **kw: orig_make(
            imgs, tgts, mt, vs, bucket=(128, 128)
        ),
    )

    cli.main([
        "--preset", "tiny_test", "--dataset_file", "pretrain",
        "--pretrain_anno", f"{anno_a},{anno_b}",
        "--vg_folder", str(img_dir),
        "--iterative_paradigm", "0,1",
        "--epochs", "1", "--max_steps", "1", "--batch_size", "8",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert (tmp_path / "out" / "log.txt").exists()
