"""Command-line entry point.

Capability parity with the reference launcher (reference: main.py:494-807):
distributed init -> build model/criterion -> optimizer param groups ->
dataset -> epoch loop with per-epoch eval, rolling checkpoints and JSON
log lines. The ~150-flag argparse zoo collapses into presets + a few
overrides (SURVEY.md §5 config note); `--variant` replaces the boolean
model-selector flags.

Multi-host TPU: `jax.distributed.initialize()` when JAX_COORDINATOR is set;
the data mesh spans all devices and the train step is one pjit program —
there is no NCCL/launcher machinery to configure.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser("rlipv2_tpu", description=__doc__)
    p.add_argument("--preset", default="rlip_parseda_v2_r50",
                   help="model preset (see rlipv2_tpu.config.PRESETS)")
    p.add_argument("--dataset_file", default="hico", choices=["hico", "vcoco", "oi_sgg", "vg", "pretrain"])
    p.add_argument("--hoi_path", type=str, help="dataset root")
    # relational pretraining (reference: train_RLIP_ParSeDA_v2_mixed_* scripts)
    p.add_argument("--pretrain_anno", type=str,
                   help="VG-format annotation JSON; comma-separate several "
                        "(e.g. vg.json,coco.json,o365.json) for "
                        "BatchIterativeSampler-style interleaving")
    p.add_argument("--vg_folder", type=str)
    p.add_argument("--coco2017_folder", type=str)
    p.add_argument("--o365_folder", type=str)
    p.add_argument("--iterative_paradigm", default="0",
                   help="comma list of dataset indices per micro-batch, e.g. 0,1,2")
    p.add_argument("--relation_threshold", type=float, default=0.0)
    p.add_argument("--pair_overlap", action="store_true")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_backbone", type=float, default=1e-5)
    p.add_argument("--lr_text_encoder", type=float, default=1e-5)
    p.add_argument("--freeze_text_encoder", action="store_true",
                   help="do not train RoBERTa (reference main.py:349); "
                        "by default slot tokens are encoded in-graph so "
                        "text gradients flow")
    p.add_argument("--text_token_len", type=int, default=24,
                   help="static token length for in-graph label encoding")
    p.add_argument("--frozen_vision", action="store_true",
                   help="freeze backbone stages 1-2 during fine-tune "
                        "(reference main.py:632-652)")
    p.add_argument("--unfrozen_params", action="store_true",
                   help="train ONLY the text encoder "
                        "(reference main.py:653-666)")
    p.add_argument("--frozen_detection", action="store_true",
                   help="freeze backbone + encoder + ho decoder + input "
                        "projections (reference main.py:667-685)")
    p.add_argument("--lr_drop", type=int, default=15)
    p.add_argument("--schedule", default="step")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--eval", action="store_true", help="eval only")
    p.add_argument("--resume", default="", help="orbax checkpoint dir")
    p.add_argument("--pretrained", default="", help="torch .pth to convert & warm-start")
    p.add_argument("--zero_shot_setting", default=None, choices=[None, "UC-RF", "UC-NF", "UO"])
    p.add_argument("--few_shot_transfer", type=int, default=100, choices=[1, 10, 100])
    p.add_argument("--use_nms_filter", action="store_true")
    p.add_argument("--eval_uniformity", action="store_true",
                   help="with --eval: also Hungarian-match predictions to "
                        "GT, dump per-verb-class verb-decoder features and "
                        "print the Wang-Isola uniformity/alignment summary "
                        "(reference: engine.py:573-697)")
    p.add_argument("--negative_text_sampling", type=int, default=0)
    p.add_argument("--sampling_strategy", default="freq")
    p.add_argument("--tokenizer_dir", default="", help="dir with vocab.json + merges.txt")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--print_freq", type=int, default=50)
    p.add_argument("--max_steps", type=int, default=None, help="debug: cap steps/epoch")
    p.add_argument("--giou_verb_label", action="store_true", help="RPL soft labels")
    p.add_argument("--triplet_filtering", action="store_true")
    # R-Tagger training (reference: main.py --verb_tagger +
    # scripts/verb_tagger/train_vg_RLIP_ParSeD_v2_tagger_resnet.sh:14-56)
    p.add_argument("--verb_tagger", action="store_true",
                   help="train the relation tagger on GT-pair noised "
                        "queries (use with --dataset_file vg)")
    p.add_argument("--label_noise_scale", type=float, default=0.3)
    p.add_argument("--box_noise_scale", type=float, default=0.6)
    # round-2 capability knobs
    p.add_argument("--variant", default=None,
                   choices=[None, "rlip_parseda_v2", "rlip_parsed_v2",
                            "rlip_parsed", "rlip_parse", "rlip_parse_v2"],
                   help="override the preset's model variant (the "
                        "closed-vocab qpic/cdn/qahoi baselines live in "
                        "models/factory.py for API use; their heads take "
                        "no text inputs so the text CLI paths don't apply)")
    p.add_argument("--verb_loss_type", default=None,
                   help="focal | bce | weighted_bce | asymmetric_bce | "
                        "CB_focal_bce | cross_modal_matching")
    p.add_argument("--obj_loss_type", default=None,
                   help="cross_entropy | focal | cross_modal_matching")
    p.add_argument("--exponential_loss", action="store_true",
                   help="exponential per-layer aux decay")
    p.add_argument("--exponential_hyper", type=float, default=0.8)
    p.add_argument("--pseudo_verb", action="store_true")
    p.add_argument("--pseudo_verb_mode", default="online",
                   choices=["online", "offline"])
    p.add_argument("--verb_curing", action="store_true")
    p.add_argument("--masked_entity_modeling", action="store_true")
    p.add_argument("--remat_encoder", action="store_true",
                   help="rematerialize encoder layers (fit bs8 832x1344 "
                        "training in 16 GB HBM)")
    p.add_argument("--fsdp", type=int, default=1,
                   help="model-axis size for FSDP param sharding "
                        "(1 = pure data parallel)")
    p.add_argument("--msda_impl", default=None,
                   choices=[None, "auto", "pallas", "pallas_v5",
                            "pallas_int8", "xla"],
                   help="MSDA kernel implementation; pallas_int8 is the "
                        "quantized inference fast path (~1.3x, <~1% rel. "
                        "error, forward-only — eval use)")
    p.add_argument("--int8_dense", action="store_true",
                   help="W8A8 dynamic-quantized dense stacks (Swin "
                        "qkv/proj/MLP, FFNs, BiMHA + MSDA projections; "
                        "ops/int8_dense.py) — inference-only opt-in")
    return p


def build_everything(args):
    import jax
    import jax.numpy as jnp

    from rlipv2_tpu.config import PRESETS, LossConfig, TrainConfig
    from rlipv2_tpu.engine import create_train_state, make_train_step
    from rlipv2_tpu.engine.loops import CachedTextEncoder
    from rlipv2_tpu.losses import SetCriterionHOI
    from rlipv2_tpu.models.parseda import RLIPParSeDA, init_model_params
    from rlipv2_tpu.parallel import create_mesh

    import dataclasses as _dc

    from rlipv2_tpu.models.factory import build_model

    cfg = PRESETS[args.preset]()
    model_overrides = {}
    if args.variant:
        model_overrides["variant"] = args.variant
    if args.pseudo_verb:
        model_overrides["pseudo_verb"] = True
        model_overrides["pseudo_verb_mode"] = args.pseudo_verb_mode
    if args.verb_curing:
        model_overrides["verb_curing"] = True
    if args.masked_entity_modeling:
        model_overrides["masked_entity_modeling"] = True
        model_overrides["subject_class"] = True
    if args.verb_tagger:
        # tagger_losses reconstruct subject classes too
        model_overrides["subject_class"] = True
    if model_overrides:
        cfg = _dc.replace(cfg, **model_overrides)
    if args.remat_encoder:
        cfg = _dc.replace(
            cfg,
            transformer=_dc.replace(cfg.transformer, remat_encoder=True),
        )
    impl = args.msda_impl
    # Round-5 demotion: pallas_int8 was the --eval default in round 4 on
    # the strength of a tiny-config random-weight metric gate. The round-5
    # flagship-dims measurement (bench.py int8_msda_map_delta_points, real
    # chip) shows a ~25-point canned-GT mAP delta at 832x1344 bs8 random
    # weights — far beyond the tiny-config bound, while the exact-kernel
    # v4-vs-v5 control is bit-identical. Until a real-weight golden gate
    # (tools/golden_check.py) bounds it, the exact kernel is the default
    # everywhere and the quantized path is strictly opt-in
    # (--msda_impl pallas_int8).
    if impl:
        cfg = _dc.replace(
            cfg,
            transformer=_dc.replace(cfg.transformer, msda_impl=impl),
        )
    if args.int8_dense:
        # inference-only: the quantized matmul has no useful gradient
        assert args.eval, "--int8_dense is an eval-only fast path"
        cfg = _dc.replace(
            cfg,
            backbone=_dc.replace(cfg.backbone, int8_dense=True),
            transformer=_dc.replace(cfg.transformer, int8_dense=True),
        )
    regime = None
    if args.frozen_vision:
        regime = "frozen_vision"
    elif args.unfrozen_params:
        regime = "unfrozen_params"
    elif args.frozen_detection:
        regime = "frozen_detection"
    tcfg = TrainConfig(
        lr=args.lr,
        lr_backbone=args.lr_backbone,
        lr_text_encoder=args.lr_text_encoder,
        epochs=args.epochs,
        lr_drop=args.lr_drop,
        schedule=args.schedule,
        batch_size=args.batch_size,
        ema=args.ema,
        seed=args.seed,
        freeze_regime=regime,
    )
    loss_overrides = {}
    if args.verb_loss_type:
        loss_overrides["verb_loss_type"] = args.verb_loss_type
    if args.obj_loss_type:
        loss_overrides["obj_loss_type"] = args.obj_loss_type
    lcfg = LossConfig(
        giou_verb_label=args.giou_verb_label,
        triplet_filtering=args.triplet_filtering,
        exponential_loss=args.exponential_loss,
        exponential_hyper=args.exponential_hyper,
        **loss_overrides,
    )

    model = build_model(cfg)
    criterion = SetCriterionHOI(
        lcfg,
        subject_class=cfg.subject_class,
        pseudo_verb=cfg.pseudo_verb,
    )

    B = args.batch_size
    T = cfg.max_obj_texts + cfg.max_verb_texts
    params = init_model_params(
            model,
            jax.random.PRNGKey(args.seed),
            jnp.zeros((1, 64, 64, 3)),
            jnp.ones((1, 64, 64), bool),
            jnp.zeros((1, T, cfg.text_encoder.hidden_size)),
            jnp.ones((1, T), bool),
            cfg.max_obj_texts,
            jnp.ones((1, 8), jnp.int32),
            jnp.ones((1, 8), jnp.int32),
            include_tagger=args.verb_tagger,
        )
    state, tx = create_train_state(
        params, tcfg, steps_per_epoch=1000,
        freeze_text_encoder=args.freeze_text_encoder,
    )
    n_dev = len(jax.devices())
    state_sharding = None
    if args.fsdp > 1 and n_dev % args.fsdp == 0:
        from rlipv2_tpu.engine import fsdp_state_sharding

        mesh = create_mesh(
            axis_names=("data", "model"),
            shape=(n_dev // args.fsdp, args.fsdp),
        )
        state_sharding = fsdp_state_sharding(mesh, state)
        state = jax.device_put(state, state_sharding)
    else:
        mesh = create_mesh() if n_dev > 1 else None
    # multi-dataset interleaving: one optimizer step accumulates one
    # micro-batch per paradigm entry (reference: engine.py:138-165)
    paradigm = [int(d) for d in args.iterative_paradigm.split(",")]
    accumulation_steps = (
        len(paradigm) if args.dataset_file == "pretrain" and len(paradigm) > 1
        else 1
    )
    # in-graph text encoding (text-encoder training) needs a tokenizer and
    # an encode_text method on the model
    text_tokens = bool(
        args.tokenizer_dir
        and not args.freeze_text_encoder
        and getattr(type(model), "encode_text", None) is not None
    )
    step = make_train_step(
        model, criterion, tx, cfg, tcfg, mesh,
        accumulation_steps=accumulation_steps,
        state_sharding=state_sharding,
        tagger=args.verb_tagger,
        box_noise_scale=args.box_noise_scale,
        label_noise_scale=args.label_noise_scale,
        text_tokens=text_tokens,
    )

    encode_method = getattr(type(model), "encode_text", None)
    encode = (
        jax.jit(lambda p, i, m: model.apply(p, i, m, method=encode_method))
        if encode_method is not None
        else None  # closed-vocab variants carry no text encoder
    )
    tokenizer = None
    if args.tokenizer_dir:
        from rlipv2_tpu.utils.tokenizer import RobertaTokenizer

        tok_dir = Path(args.tokenizer_dir)
        tokenizer = RobertaTokenizer.from_files(
            tok_dir / "vocab.json", tok_dir / "merges.txt"
        )

    def encode_fn(texts):
        import numpy as np

        if tokenizer is None:
            raise RuntimeError(
                "label-text encoding needs --tokenizer_dir with vocab.json + merges.txt"
            )
        ids, mask = tokenizer.batch_encode(texts)
        return np.asarray(encode(state.params, jnp.asarray(ids), jnp.asarray(mask)))

    def tokenize_fn(texts):
        import numpy as np

        L = args.text_token_len
        ids, mask = tokenizer.batch_encode(texts, max_len=L)
        if ids.shape[1] < L:  # STATIC token length -> one compiled step
            pad = L - ids.shape[1]
            ids = np.pad(ids, ((0, 0), (0, pad)),
                         constant_values=tokenizer.pad)
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return ids, mask

    return {
        "cfg": cfg,
        "tcfg": tcfg,
        "model": model,
        "criterion": criterion,
        "state": state,
        "step": step,
        "mesh": mesh,
        "accumulation_steps": accumulation_steps,
        "text_encoder": CachedTextEncoder(encode_fn),
        "tokenize_fn": tokenize_fn if text_tokens else None,
    }


def main(argv=None):
    args = get_parser().parse_args(argv)

    if os.environ.get("JAX_COORDINATOR"):
        import jax

        jax.distributed.initialize()

    from rlipv2_tpu.data.hico import build_hico
    from rlipv2_tpu.engine.checkpoint import CheckpointManager
    from rlipv2_tpu.engine.loops import evaluate_hoi, train_one_epoch
    from rlipv2_tpu.utils.logging import append_log_line

    ctx = build_everything(args)
    cfg, state, step = ctx["cfg"], ctx["state"], ctx["step"]

    out_dir = Path(args.output_dir)
    mgr = CheckpointManager(out_dir / "ckpt")
    if args.resume:
        restored = CheckpointManager(args.resume).restore(state)
        if restored is not None:
            state = restored
            print(f"resumed from {args.resume} @ step {int(state.step)}")

    if args.dataset_file == "pretrain":
        return run_pretrain(args, ctx)
    if args.dataset_file == "vg":
        return run_vg(args, ctx)

    import jax as _jax

    if args.dataset_file in ("vcoco", "oi_sgg"):
        from rlipv2_tpu.engine.loops import evaluate_sgg, evaluate_vcoco

        apply_fn = _jax.jit(
            lambda p, px, v, te, tv, n: ctx["model"].apply(p, px, v, te, tv, n),
            static_argnums=(5,),
        )
        if args.dataset_file == "vcoco":
            from rlipv2_tpu.data.vcoco import build_vcoco

            ds = build_vcoco("val", args.hoi_path, ctx["cfg"].num_queries)
            stats = evaluate_vcoco(
                apply_fn, state.params, ds, ctx["cfg"], ctx["text_encoder"],
                batch_size=args.batch_size,
            )
        else:
            from rlipv2_tpu.data.oi_sgg import build_oi_sgg

            ds = build_oi_sgg("val", args.hoi_path, ctx["cfg"].num_queries)
            stats = evaluate_sgg(
                apply_fn, state.params, ds, ctx["cfg"], ctx["text_encoder"],
                batch_size=args.batch_size, use_nms_filter=args.use_nms_filter,
            )
        print(stats)
        return stats

    val_ds = build_hico(
        "val", args.hoi_path, cfg.num_queries,
        zero_shot_setting=args.zero_shot_setting,
        few_shot_transfer=args.few_shot_transfer,
    )

    import jax

    apply_fn = jax.jit(
        lambda p, px, v, te, tv, n: ctx["model"].apply(p, px, v, te, tv, n),
        static_argnums=(5,),
    )

    if args.eval:
        if args.eval_uniformity:
            from rlipv2_tpu.engine.loops import (
                evaluate_hoi_matching_uniformity,
            )

            stats, analysis, _ = evaluate_hoi_matching_uniformity(
                apply_fn, state.params, val_ds, cfg, ctx["text_encoder"],
                batch_size=args.batch_size,
                use_nms_filter=args.use_nms_filter,
                save_path=str(out_dir / "verb_class_features.npz"),
            )
            print(stats)
            print(analysis)
            return stats
        stats = evaluate_hoi(
            apply_fn, state.params, val_ds, cfg, ctx["text_encoder"],
            batch_size=args.batch_size, use_nms_filter=args.use_nms_filter,
        )
        print(stats)
        return stats

    train_ds = build_hico(
        "train", args.hoi_path, cfg.num_queries,
        zero_shot_setting=args.zero_shot_setting,
        few_shot_transfer=args.few_shot_transfer,
    )
    import random

    rng = random.Random(args.seed)
    for epoch in range(args.epochs):
        indices = list(range(len(train_ds)))
        rng.shuffle(indices)
        t0 = time.time()
        state, train_stats = train_one_epoch(
            step, state, train_ds, indices, args.batch_size, cfg,
            ctx["text_encoder"], epoch=epoch,
            negative_text_sampling=args.negative_text_sampling,
            obj_vocab=train_ds.object_text, verb_vocab=train_ds.verb_text,
            print_freq=args.print_freq, max_steps=args.max_steps,
            num_workers=args.num_workers,
            tokenize_fn=ctx["tokenize_fn"],
        )
        mgr.save(epoch, state, config=ctx["tcfg"])
        stats = evaluate_hoi(
            apply_fn, state.params, val_ds, cfg, ctx["text_encoder"],
            batch_size=args.batch_size, use_nms_filter=args.use_nms_filter,
        )
        append_log_line(
            out_dir,
            {
                "epoch": epoch,
                "train": train_stats,
                "test": stats,
                "epoch_time": time.time() - t0,
            },
        )
        print(f"epoch {epoch}: mAP {stats['mAP']:.4f}")
    return state


def run_pretrain(args, ctx):
    """Relational pre-training over one or several VG-format datasets
    (reference: scripts/RLIP_ParSeDA/train_RLIP_ParSeDA_v2_mixed_*.sh +
    engine.py:45-201 with BatchIterativeDistributedSampler,
    datasets/mixed_dataset.py:48-220).

    With several --pretrain_anno files the batches interleave per
    --iterative_paradigm (e.g. "0,1,2" = a VG batch, a COCO batch, an O365
    batch), and ONE optimizer step accumulates one micro-batch per
    paradigm entry — exactly the reference's gradient_accumulation
    strategy (engine.py:138-165)."""
    import time as _time

    from rlipv2_tpu.data.vg import (
        ConcatRelDataset,
        VGRelDataset,
        batch_iterative_indices,
    )
    from rlipv2_tpu.engine.checkpoint import CheckpointManager
    from rlipv2_tpu.engine.loops import train_one_epoch
    from rlipv2_tpu.utils.logging import append_log_line

    folders = {
        "vg": args.vg_folder,
        "coco2017": args.coco2017_folder,
        "o365": args.o365_folder,
    }
    anno_files = [a for a in args.pretrain_anno.split(",") if a]
    datasets = [
        VGRelDataset(
            anno,
            folders,
            num_queries=ctx["cfg"].num_queries,
            relation_threshold=args.relation_threshold,
            pair_overlap=args.pair_overlap,
        )
        for anno in anno_files
    ]
    ds = datasets[0] if len(datasets) == 1 else ConcatRelDataset(datasets)
    sizes = [len(d) for d in datasets]
    obj_vocab = getattr(ds, "object_names")
    verb_vocab = getattr(ds, "relationship_names")
    paradigm = [int(d) for d in args.iterative_paradigm.split(",")]
    K = ctx["accumulation_steps"]
    mgr = CheckpointManager(Path(args.output_dir) / "ckpt")
    state = ctx["state"]
    for epoch in range(args.epochs):
        batches = batch_iterative_indices(
            sizes, args.batch_size, paradigm, shuffle=True,
            seed=args.seed, epoch=epoch,
        )
        if K > 1:
            # group one full-size micro-batch per paradigm entry into a
            # single accumulated step; drop ragged tail cycles
            groups = [
                batches[i : i + K]
                for i in range(0, len(batches) - K + 1, K)
                if all(len(b) == args.batch_size for b in batches[i : i + K])
            ]
            batches = groups
        else:
            batches = [b for b in batches if len(b) == args.batch_size]
        t0 = _time.time()
        state, stats = train_one_epoch(
            ctx["step"], state, ds, indices=[], batch_size=args.batch_size,
            cfg=ctx["cfg"], text_encoder=ctx["text_encoder"], epoch=epoch,
            negative_text_sampling=args.negative_text_sampling,
            obj_vocab=obj_vocab, verb_vocab=verb_vocab,
            obj_freqs=list(ds.object_freq.values()),
            verb_freqs=list(ds.relationship_freq.values()),
            sampling_strategy=args.sampling_strategy,
            print_freq=args.print_freq, max_steps=args.max_steps,
            batch_lists=batches, num_workers=args.num_workers,
            tokenize_fn=ctx["tokenize_fn"],
            accumulation_steps=K,
        )
        mgr.save(epoch, state, config=ctx["tcfg"])
        append_log_line(
            Path(args.output_dir),
            {"epoch": epoch, "train": stats, "epoch_time": _time.time() - t0},
        )
    return state


def run_vg(args, ctx):
    """VG relational training; with --verb_tagger this is the R-Tagger
    training entry (reference: main.py --verb_tagger --cross_modal_pretrain
    on VGRelTagger, scripts/verb_tagger/train_vg_RLIP_ParSeD_v2_tagger_
    resnet.sh). Each GT (sub, obj) pair plus sampled negative pairs become
    noised queries; tagger_losses reconstruct boxes/classes/relations."""
    import time as _time

    from rlipv2_tpu.data.vg import VGRelDataset, VGRelTaggerDataset
    from rlipv2_tpu.engine.checkpoint import CheckpointManager
    from rlipv2_tpu.engine.loops import train_one_epoch
    from rlipv2_tpu.utils.logging import append_log_line

    cfg = ctx["cfg"]
    ds_cls = VGRelTaggerDataset if args.verb_tagger else VGRelDataset
    ds = ds_cls(
        args.pretrain_anno,
        {"vg": args.vg_folder},
        num_queries=cfg.num_queries,
        relation_threshold=args.relation_threshold,
        pair_overlap=args.pair_overlap,
    )
    # tagger slots are the query pairs themselves — pad targets to
    # num_queries // 2 (forward_tagger requires M == nq // 2)
    max_triplets = cfg.num_queries // 2 if args.verb_tagger else None
    mgr = CheckpointManager(Path(args.output_dir) / "ckpt")
    state = ctx["state"]
    import random as _random

    rng = _random.Random(args.seed)
    for epoch in range(args.epochs):
        indices = list(range(len(ds)))
        rng.shuffle(indices)
        t0 = _time.time()
        state, stats = train_one_epoch(
            ctx["step"], state, ds, indices=indices,
            batch_size=args.batch_size,
            cfg=cfg, text_encoder=ctx["text_encoder"], epoch=epoch,
            negative_text_sampling=args.negative_text_sampling,
            obj_vocab=ds.object_names, verb_vocab=ds.relationship_names,
            obj_freqs=list(ds.object_freq.values()),
            verb_freqs=list(ds.relationship_freq.values()),
            sampling_strategy=args.sampling_strategy,
            print_freq=args.print_freq, max_steps=args.max_steps,
            num_workers=args.num_workers,
            tokenize_fn=ctx["tokenize_fn"], max_triplets=max_triplets,
        )
        mgr.save(epoch, state, config=ctx["tcfg"])
        append_log_line(
            Path(args.output_dir),
            {"epoch": epoch, "train": stats, "epoch_time": _time.time() - t0},
        )
    return state


if __name__ == "__main__":
    main()
