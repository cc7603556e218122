"""Full-slice smoke: synthetic HICO data -> train_one_epoch -> evaluate_hoi
with the tiny model. Exercises every layer of the framework."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlipv2_tpu.config import LossConfig, TrainConfig
from rlipv2_tpu.data.hico import HICODataset
from rlipv2_tpu.data.transforms import HOITransform
from rlipv2_tpu.engine import create_train_state, make_train_step
from rlipv2_tpu.engine.loops import CachedTextEncoder, evaluate_hoi, train_one_epoch
from rlipv2_tpu.losses import SetCriterionHOI
from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
from test_data_pipeline import synth_hico  # fixture reuse  # noqa: F401
from test_parseda_forward import tiny_config

PIL = pytest.importorskip("PIL")


def hash_tokenize(texts, vocab_size=120, maxlen=6):
    """Deterministic toy tokenizer for tests."""
    ids = np.ones((len(texts), maxlen), np.int32)
    mask = np.zeros((len(texts), maxlen), np.int32)
    for i, t in enumerate(texts):
        toks = [2 + (hash(w) % (vocab_size - 3)) for w in t.split()][: maxlen - 1]
        toks = [0] + toks
        ids[i, : len(toks)] = toks
        mask[i, : len(toks)] = 1
    return ids, mask


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = tiny_config()
    model = RLIPParSeDA(cfg)
    B, H, W = 1, 64, 64
    T = cfg.max_obj_texts + cfg.max_verb_texts
    params = init_model_params(
        model,
        jax.random.PRNGKey(0),
        jnp.zeros((B, H, W, 3)),
        jnp.ones((B, H, W), bool),
        jnp.zeros((B, T, cfg.text_encoder.hidden_size)),
        jnp.ones((B, T), bool),
        cfg.max_obj_texts,
        jnp.ones((2, 6), jnp.int32),
        jnp.ones((2, 6), jnp.int32),
    )
    encode = jax.jit(
        lambda p, i, m: model.apply(p, i, m, method=RLIPParSeDA.encode_text)
    )

    def encode_fn(texts):
        ids, mask = hash_tokenize(texts)
        return np.asarray(encode(params, jnp.asarray(ids), jnp.asarray(mask)))

    return cfg, model, params, CachedTextEncoder(encode_fn)


def small_vocab_dataset(synth_hico, train):  # noqa: F811
    root, anno_file = synth_hico
    ds = HICODataset(
        "train" if train else "val",
        root / "images",
        anno_file,
        transforms=HOITransform(train=False, val_size=96, max_size=160),
    )
    # shrink the label space so tiny max_obj_texts=5 / max_verb_texts=7 fit
    ds.object_text = ds.object_text[:4]
    ds.verb_text = ds.verb_text[:7]
    return ds


def remap_small(ds):
    """Clamp annotation label indices into the shrunk vocab."""
    for anno in ds.annotations:
        for a in anno["annotations"]:
            a["category_id"] = [1, 2, 3, 4][a["category_id"] % 4]
        for h in anno["hoi_annotation"]:
            h["category_id"] = 1 + (h["category_id"] % 7)


def test_train_then_eval(tiny_setup, synth_hico):  # noqa: F811
    cfg, model, params, text_encoder = tiny_setup

    train_ds = small_vocab_dataset(synth_hico, train=True)
    remap_small(train_ds)
    tcfg = TrainConfig(lr=1e-4, ema=False, batch_size=2)
    criterion = SetCriterionHOI(LossConfig())
    state, tx = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=2
    )
    step = make_train_step(model, criterion, tx, cfg, tcfg, mesh=None)

    state, metrics = train_one_epoch(
        step,
        state,
        train_ds,
        indices=list(range(len(train_ds))),
        batch_size=2,
        cfg=cfg,
        text_encoder=text_encoder,
        epoch=0,
        print_freq=1,
    )
    assert np.isfinite(metrics["loss"])

    val_ds = small_vocab_dataset(synth_hico, train=False)
    remap_small(val_ds)
    val_ds.rare_triplets = []
    val_ds.non_rare_triplets = []

    apply_fn = jax.jit(
        lambda p, px, v, te, tv, n: model.apply(p, px, v, te, tv, n),
        static_argnums=(5,),
    )
    results = evaluate_hoi(
        apply_fn,
        state.params,
        val_ds,
        cfg,
        text_encoder,
        batch_size=2,
        bucket=(512, 512),
        max_images=2,
    )
    assert set(results) == {"mAP", "mAP rare", "mAP non-rare", "mean max recall"}
    assert 0.0 <= results["mAP"] <= 1.0


def test_pretrain_cli_loop(tiny_setup, tmp_path):
    """Pretraining path: VG dataset + batch-iterative batches through
    train_one_epoch."""
    import json as _json

    from PIL import Image
    from rlipv2_tpu.data.transforms import HOITransform
    from rlipv2_tpu.data.vg import VGRelDataset, batch_iterative_indices
    from rlipv2_tpu.engine import create_train_state, make_train_step

    cfg, model, params, text_encoder = tiny_setup
    # tiny VG dataset
    img_dir = tmp_path / "vg"
    img_dir.mkdir()
    rng = np.random.RandomState(5)
    annos = []
    for i in range(4):
        iid = 500 + i
        Image.fromarray((rng.rand(96, 96, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{iid}.jpg"
        )
        annos.append(
            {
                "image_id": iid,
                "objects": [
                    {"object_id": 1, "x": 5, "y": 5, "w": 40, "h": 40, "names": "man"},
                    {"object_id": 2, "x": 20, "y": 20, "w": 40, "h": 40, "names": "dog"},
                ],
                "relationships": [
                    {"subject_id": 1, "object_id": 2, "predicate": "pets"}
                ],
            }
        )
    af = tmp_path / "vg.json"
    af.write_text(_json.dumps(annos))
    ds = VGRelDataset(
        af, {"vg": img_dir}, num_queries=cfg.num_queries,
        transforms=HOITransform(train=False, val_size=64, max_size=96),
    )

    from rlipv2_tpu.config import LossConfig, TrainConfig
    from rlipv2_tpu.losses import SetCriterionHOI

    tcfg = TrainConfig(ema=False)
    crit = SetCriterionHOI(LossConfig())
    state, tx = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=2
    )
    step = make_train_step(model, crit, tx, cfg, tcfg, mesh=None)
    batches = batch_iterative_indices([len(ds)], 2, [0], shuffle=False)
    state, stats = train_one_epoch(
        step, state, ds, indices=[], batch_size=2, cfg=cfg,
        text_encoder=text_encoder, epoch=0, print_freq=1,
        negative_text_sampling=6,
        obj_vocab=["man", "dog", "cat", "horse"],
        verb_vocab=["pets", "rides", "holds", "feeds", "walks", "near"],
        batch_lists=batches,
    )
    assert np.isfinite(stats["loss"])


def test_evaluate_vcoco_and_sgg_loops(tiny_setup, synth_hico):  # noqa: F811
    """V-COCO and OI-SGG eval loops run end-to-end on synthetic data."""
    from rlipv2_tpu.engine.loops import evaluate_sgg, evaluate_vcoco

    cfg, model, params, text_encoder = tiny_setup
    val_ds = small_vocab_dataset(synth_hico, train=False)
    remap_small(val_ds)

    apply_fn = jax.jit(
        lambda p, px, v, te, tv, n: model.apply(p, px, v, te, tv, n),
        static_argnums=(5,),
    )
    r = evaluate_vcoco(
        apply_fn, params, val_ds, cfg, text_encoder,
        batch_size=2, bucket=(512, 512), max_images=2,
    )
    assert "mAP_all" in r and np.isfinite(r["mAP_all"])

    r2 = evaluate_sgg(
        apply_fn, params, val_ds, cfg, text_encoder,
        batch_size=2, bucket=(512, 512), max_images=2,
    )
    assert "score_wtd (wmAP)" in r2
    assert "mAP@50 (RelD)" in r2 and "mAP@100 (PhrD)" in r2


def test_prefetch_map_order_and_parallelism():
    """prefetch_map yields in order for any worker count; worker batches
    draw deterministic per-batch rng streams."""
    from rlipv2_tpu.data.loader import batch_rng, prefetch_map

    items = list(range(20))
    got0 = list(prefetch_map(lambda x: x * x, items, num_workers=0))
    got4 = list(prefetch_map(lambda x: x * x, items, num_workers=4))
    assert got0 == got4 == [x * x for x in items]

    a = batch_rng(0, 3, 7).random()
    b = batch_rng(0, 3, 7).random()
    c = batch_rng(0, 3, 8).random()
    assert a == b != c


def test_train_one_epoch_with_text_tokens(tiny_setup, synth_hico):  # noqa: F811
    """End-to-end epoch with tokenize_fn: the step encodes the slot tokens
    in-graph, so the text encoder receives real updates (reference trains
    RoBERTa with text_encoder_lr, main.py:520-536)."""
    cfg, model, params, text_encoder = tiny_setup

    train_ds = small_vocab_dataset(synth_hico, train=True)
    remap_small(train_ds)
    tcfg = TrainConfig(lr=1e-4, ema=False, batch_size=2)
    criterion = SetCriterionHOI(LossConfig())
    state, tx = create_train_state(
        jax.tree_util.tree_map(jnp.copy, params), tcfg, steps_per_epoch=2
    )
    step = make_train_step(
        model, criterion, tx, cfg, tcfg, mesh=None, text_tokens=True
    )

    def leaf(p):
        return np.asarray(
            p["params"]["text_encoder"]["layers"]["attention_self"]
            ["query"]["kernel"][0]
        )

    before = leaf(params)
    state, metrics = train_one_epoch(
        step,
        state,
        train_ds,
        indices=list(range(len(train_ds))),
        batch_size=2,
        cfg=cfg,
        text_encoder=text_encoder,
        epoch=0,
        print_freq=1,
        tokenize_fn=hash_tokenize,
    )
    assert np.isfinite(metrics["loss"])
    assert np.abs(leaf(state.params) - before).max() > 0


def test_evaluate_hoi_matching_uniformity(tiny_setup, synth_hico, tmp_path):  # noqa: F811
    """Uniformity analysis eval: matches predictions to GT and collects
    per-verb-class verb-decoder features (reference: engine.py:573-697)."""
    from rlipv2_tpu.engine.loops import evaluate_hoi_matching_uniformity

    cfg, model, params, text_encoder = tiny_setup
    val_ds = small_vocab_dataset(synth_hico, train=False)
    remap_small(val_ds)
    val_ds.rare_triplets = []
    val_ds.non_rare_triplets = []

    apply_fn = jax.jit(
        lambda p, px, v, te, tv, n: model.apply(p, px, v, te, tv, n),
        static_argnums=(5,),
    )
    save_path = str(tmp_path / "verb_features.npz")
    stats, analysis, class_features = evaluate_hoi_matching_uniformity(
        apply_fn,
        params,
        val_ds,
        cfg,
        text_encoder,
        batch_size=2,
        bucket=(512, 512),
        max_images=2,
        max_gt=8,
        save_path=save_path,
    )
    assert 0.0 <= stats["mAP"] <= 1.0
    n_collected = sum(len(f) for f in class_features.values())
    # every GT pair of the two eval images contributes one feature per verb
    assert n_collected > 0
    assert analysis["n_features"] == n_collected
    assert analysis["n_classes"] > 0
    if n_collected >= 2:
        assert np.isfinite(analysis["uniformity"])
        assert analysis["alignment"] >= 0.0
    # features have the decoder width and the dump file loads back
    any_feats = next(f for f in class_features.values() if f)
    assert any_feats[0].shape == (cfg.transformer.hidden_dim,)
    loaded = np.load(save_path, allow_pickle=True)
    assert "verb_class_dict" in loaded
