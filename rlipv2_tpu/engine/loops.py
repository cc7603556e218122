"""Host-side train/eval loops.

Capability parity with the reference engine (reference: engine.py):
  * train_one_epoch (engine.py:45-201): per step build the merged text
    batch, encode label texts, run the jitted train step, log smoothed
    metrics, abort on non-finite loss (engine.py:125-128 — here we raise
    instead of sys.exit so callers can checkpoint first);
  * evaluate_hoi_with_text (engine.py:360-468): encode the full label
    vocabulary ONCE, two-phase forward collapsed into the jitted apply,
    postprocess on device, accumulate host-side predictions + GTs, run the
    evaluator. Multi-host: each host evaluates its shard and results are
    gathered by the caller (process_allgather) — no pickle collectives.

Text features are produced by a `text_encoder_fn(list[str]) -> (N, D)`
callable (tokenize + RobertaModel.encode_text under jit) and cached per
unique text across the epoch, which subsumes the reference's one-shot
vocabulary encoding and is also what makes VG-style per-batch label spaces
cheap.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.config import ModelConfig
from rlipv2_tpu.data.loader import batch_rng, prefetch_map
from rlipv2_tpu.data.pipeline import build_train_batch
from rlipv2_tpu.engine.train import TrainBatch
from rlipv2_tpu.eval.hico_eval import HICOEvaluator
from rlipv2_tpu.eval.postprocess import postprocess_hoi, to_image_results
from rlipv2_tpu.structures import HOITargets
from rlipv2_tpu.utils.logging import MetricLogger


class CachedTextEncoder:
    """Memoizes pooled text features per unique label text."""

    def __init__(self, encode_fn: Callable[[Sequence[str]], np.ndarray]):
        self.encode_fn = encode_fn
        self.cache: dict[str, np.ndarray] = {}

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        missing = [t for t in texts if t not in self.cache]
        if missing:
            feats = np.asarray(self.encode_fn(missing))
            for t, f in zip(missing, feats):
                self.cache[t] = f
        return np.stack([self.cache[t] for t in texts])


def _batch_from_arrays(arrays, text_emb, text_valid, token_ids=None,
                       token_mask=None):
    targets = HOITargets(
        obj_labels=jnp.asarray(arrays["obj_labels"], jnp.int32),
        sub_labels=jnp.asarray(arrays["sub_labels"], jnp.int32),
        verb_labels=jnp.asarray(arrays["verb_labels"]),
        sub_boxes=jnp.asarray(arrays["sub_boxes"]),
        obj_boxes=jnp.asarray(arrays["obj_boxes"]),
        valid=jnp.asarray(arrays["triplet_valid"]),
    )
    return TrainBatch(
        pixels=jnp.asarray(arrays["pixels"]),
        pixel_valid=jnp.asarray(arrays["pixel_valid"]),
        text_emb=jnp.asarray(text_emb),
        text_valid=jnp.asarray(text_valid),
        targets=targets,
        token_ids=None if token_ids is None else jnp.asarray(token_ids),
        token_mask=None if token_mask is None else jnp.asarray(token_mask),
    )


def train_one_epoch(
    step_fn,
    state,
    dataset,
    indices: Sequence[int],
    batch_size: int,
    cfg: ModelConfig,
    text_encoder: CachedTextEncoder,
    epoch: int = 0,
    negative_text_sampling: int = 0,
    obj_vocab=None,
    verb_vocab=None,
    obj_freqs=None,
    verb_freqs=None,
    sampling_strategy: str = "freq",
    print_freq: int = 50,
    logger: Optional[MetricLogger] = None,
    rng=None,
    max_steps: Optional[int] = None,
    max_triplets: Optional[int] = None,
    batch_lists: Optional[Sequence[Sequence[int]]] = None,
    num_workers: int = 0,
    accumulation_steps: int = 1,
    tokenize_fn=None,
):
    """tokenize_fn (texts -> (ids, mask) int32 arrays), when given, puts
    the batch's slot TOKENS into the TrainBatch so the step encodes text
    in-graph and the text encoder trains (reference main.py:520-536
    text_encoder_lr group; omit it / --freeze_text_encoder for the frozen
    path). indices + batch_size give a plain epoch; batch_lists (e.g. from
    data/vg.batch_iterative_indices) gives pre-built whole batches for
    multi-dataset interleaving. With accumulation_steps > 1 each
    batch_lists entry is a group of K micro-batch index lists; the K
    micro-batches are stacked on a leading axis for the accumulating
    train step (engine/train.py grads_accumulated).

    num_workers > 0 builds batches in a threaded prefetch window
    (data/loader.py) and fetches step metrics one step LATE, so host
    batch building and the device step overlap (the reference gets the
    same overlap from DataLoader workers + CUDA async dispatch); each
    batch then draws from its own deterministic rng stream."""
    import random as _random

    rng = rng or _random.Random(epoch)
    if max_triplets is None:
        # the matcher needs M <= n_pairs (= num_queries // 2)
        max_triplets = min(64, cfg.num_queries // 2)
    logger = logger or MetricLogger()
    if batch_lists is not None:
        n_batches = len(batch_lists)
    else:
        n_batches = len(indices) // batch_size
    if max_steps is not None:
        n_batches = min(n_batches, max_steps)

    def batches():
        for i in range(n_batches):
            if batch_lists is not None:
                yield list(batch_lists[i])
            else:
                yield indices[i * batch_size : (i + 1) * batch_size]

    def make_batch(job):
        bidx, batch_ids = job
        b_rng = (
            rng if num_workers <= 0
            else batch_rng(0, epoch, bidx)
        )
        if accumulation_steps > 1:
            # batch_ids is a group of K micro-batch index lists; each
            # micro-batch may land in a different resolution bucket, so
            # pad all to the group max before stacking
            micros = [_make_one(list(ids), b_rng) for ids in batch_ids]
            Hm = max(m.pixels.shape[1] for m in micros)
            Wm = max(m.pixels.shape[2] for m in micros)

            def padto(x):
                ph, pw = Hm - x.shape[1], Wm - x.shape[2]
                if ph == 0 and pw == 0:
                    return x
                pad = [(0, 0), (0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 3)
                return jnp.pad(x, pad)

            micros = [
                m._replace(pixels=padto(m.pixels),
                           pixel_valid=padto(m.pixel_valid))
                for m in micros
            ]
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *micros)
        return _make_one(batch_ids, b_rng)

    def _make_one(batch_ids, b_rng):
        samples = [dataset[i] for i in batch_ids]
        arrays, obj_slots, verb_slots = build_train_batch(
            samples,
            max_obj_texts=cfg.max_obj_texts,
            max_verb_texts=cfg.max_verb_texts,
            max_triplets=max_triplets,
            negative_text_sampling=negative_text_sampling,
            obj_vocab=obj_vocab,
            verb_vocab=verb_vocab,
            obj_freqs=obj_freqs,
            verb_freqs=verb_freqs,
            sampling_strategy=sampling_strategy,
            rng=b_rng,
        )
        slot_texts = [
            t if t else "." for t in list(obj_slots) + list(verb_slots)
        ]  # pad slots encode '.'
        feats = text_encoder(slot_texts)
        B = arrays["pixels"].shape[0]
        text_emb = np.tile(feats[None], (B, 1, 1))
        text_valid = np.concatenate(
            [arrays["obj_text_valid"], arrays["verb_text_valid"]], axis=1
        )
        token_ids = token_mask = None
        if tokenize_fn is not None:
            token_ids, token_mask = tokenize_fn(slot_texts)
        return _batch_from_arrays(
            arrays, text_emb, text_valid, token_ids, token_mask
        )

    def flush(metrics):
        loss = float(metrics["loss"])
        if not math.isfinite(loss):
            raise FloatingPointError(f"non-finite loss {loss} at epoch {epoch}")
        logger.update(
            loss=loss,
            grad_norm=float(metrics["grad_norm"]),
            obj_ce=float(metrics["loss_obj_ce"]),
            verb_ce=float(metrics["loss_verb_ce"]),
        )

    batch_iter = prefetch_map(
        make_batch, enumerate(batches()), num_workers
    )
    pending_metrics = None
    for batch in logger.log_every(
        _SizedIter(batch_iter, n_batches), print_freq, f"Epoch [{epoch}]"
    ):
        state, metrics = step_fn(state, batch)
        if pending_metrics is not None:
            flush(pending_metrics)  # one step late: keeps dispatch async
        pending_metrics = metrics
    if pending_metrics is not None:
        flush(pending_metrics)
    return state, {k: m.global_avg for k, m in logger.meters.items()}


class _SizedIter:
    def __init__(self, it, n):
        self.it, self.n = iter(it), n

    def __len__(self):
        return self.n

    def __iter__(self):
        return self.it


def evaluate_hoi(
    apply_fn,
    params,
    dataset,
    cfg: ModelConfig,
    text_encoder: CachedTextEncoder,
    batch_size: int = 8,
    bucket=(832, 1344),
    subject_category_id: int = 0,
    zero_shot_subject_filter: bool = False,
    use_nms_filter: bool = False,
    max_images: Optional[int] = None,
    rank: int = 0,
    world: int = 1,
    gather_fn=None,
    max_gt_boxes: int = 128,
    max_gt_hois: int = 128,
):
    """Full-vocabulary HICO-style evaluation. apply_fn(params, pixels,
    valid, text_emb, text_valid, n_obj) -> output dict.

    Multi-host: pass rank/world (and optionally gather_fn, default
    multihost process_allgather). Each process evaluates a wrap-padded
    strided shard of the dataset, fixed-shape prediction + GT arrays are
    all-gathered, and duplicates are dropped by image index (reference:
    engine.py:326-329, :439-453; util/misc.py:102-143)."""
    obj_texts = list(dataset.object_text) + ["no objects"]
    verb_texts = list(dataset.verb_text)
    n_obj = len(obj_texts)
    n_verb = len(verb_texts)
    feats = text_encoder(obj_texts + verb_texts)  # (n_obj+n_verb, D)

    n_images = len(dataset) if max_images is None else min(max_images, len(dataset))
    if world > 1 or gather_fn is not None:
        preds, gts = _collect_predictions_sharded(
            apply_fn, params, dataset, feats, n_obj, n_images, batch_size,
            bucket, subject_category_id, zero_shot_subject_filter,
            rank, world, gather_fn, max_gt_boxes, max_gt_hois,
        )
        return _run_hico_evaluator(
            dataset, preds, gts, n_obj, n_verb, use_nms_filter
        )
    preds, gts = [], []

    def make_eval_batch(start):
        ids = range(start, min(start + batch_size, n_images))
        samples = [dataset[i] for i in ids]
        images = [s[0] for s in samples]
        targets = [s[1] for s in samples]
        B = len(images)
        H, W = bucket
        pixels = np.zeros((B, H, W, 3), np.asarray(images[0]).dtype)
        valid = np.zeros((B, H, W), bool)
        for b, im in enumerate(images):
            h, w = im.shape[:2]
            assert h <= H and w <= W, (
                f"eval image ({h},{w}) exceeds the fixed bucket ({H},{W}); "
                "pass a larger `bucket` (val resize is shorter-side-800 / "
                "max-1333, so (832, 1344) covers it unless the transform "
                "was changed)"
            )
            pixels[b, :h, :w] = im
            valid[b, :h, :w] = True
        text_emb = np.tile(feats[None], (B, 1, 1))
        text_valid = np.ones((B, n_obj + n_verb), bool)
        return pixels, valid, text_emb, text_valid, targets

    # threaded prefetch (data/loader.py): batch packing overlaps the
    # device forward, mirroring the train loop
    for pixels, valid, text_emb, text_valid, targets in prefetch_map(
        make_eval_batch, range(0, n_images, batch_size), num_workers=2
    ):
        out = apply_fn(
            params,
            jnp.asarray(pixels),
            jnp.asarray(valid),
            jnp.asarray(text_emb),
            jnp.asarray(text_valid),
            n_obj,
        )
        orig = jnp.asarray(
            np.stack([t["orig_size"] for t in targets]).astype(np.float32)
        )
        post = postprocess_hoi(
            out, orig, subject_class=zero_shot_subject_filter
        )
        results = to_image_results(
            post, subject_category_id, zero_shot_subject_filter
        )
        preds.extend(results)
        gts.extend(
            {
                "filename": t["filename"],
                "boxes": np.asarray(t["boxes"]),
                "labels": np.asarray(t["labels"]),
                "hois": np.asarray(t["hois"]),
            }
            for t in targets
        )

    return _run_hico_evaluator(dataset, preds, gts, n_obj, n_verb, use_nms_filter)


def _run_hico_evaluator(dataset, preds, gts, n_obj, n_verb, use_nms_filter):
    correct_mat = dataset.correct_mat
    if correct_mat is None:
        correct_mat = np.ones((n_verb, n_obj - 1), np.float64)
    evaluator = HICOEvaluator(
        preds,
        gts,
        dataset.rare_triplets,
        dataset.non_rare_triplets,
        correct_mat,
        use_nms_filter=use_nms_filter,
    )
    return evaluator.evaluate()


def evaluate_hoi_matching_uniformity(
    apply_fn,
    params,
    dataset,
    cfg: ModelConfig,
    text_encoder: CachedTextEncoder,
    batch_size: int = 8,
    bucket=(832, 1344),
    subject_category_id: int = 0,
    use_nms_filter: bool = False,
    max_images: Optional[int] = None,
    max_gt: int = 64,
    save_path: Optional[str] = None,
    cost_obj_class: float = 1.0,
    cost_verb_class: float = 1.0,
    cost_bbox: float = 2.5,
    cost_giou: float = 1.0,
):
    """HICO-style eval that ALSO Hungarian-matches predictions to the GT
    triplets and collects the matched verb-decoder features per GT verb
    class, for the representation uniformity/alignment analysis
    (reference: engine.py:573-697 `evaluate_hoi_with_text_matching_
    uniformity`; per-class feature dict built at engine.py:647-655, dumped
    via np.savez_compressed at :677-678).

    `apply_fn` must return "verb_decoder_out" (the last verb-decoder
    layer's hidden states, reference models/hoi.py:2173) in its output.
    The val-format GTs (boxes/labels/hois in original pixel space) are
    padded into matcher `HOITargets` here — per-(sub, obj)-pair multi-hot
    verb labels, normalized cxcywh boxes — so the same on-device matcher
    as training is reused.

    Returns `(stats, analysis, class_features)`: the evaluator stats, the
    Wang-Isola summary (`tools.uniformity.analyze`) and the raw
    `{verb_class: [feature, ...]}` dict (saved compressed to `save_path`
    when given, mirroring the reference's `save_relation_ft_path`)."""
    from rlipv2_tpu.losses.matcher import hoi_matching_costs, hungarian_match
    from rlipv2_tpu.tools.uniformity import analyze

    obj_texts = list(dataset.object_text) + ["no objects"]
    verb_texts = list(dataset.verb_text)
    n_obj = len(obj_texts)
    n_verb = len(verb_texts)
    feats = text_encoder(obj_texts + verb_texts)

    n_images = len(dataset) if max_images is None else min(max_images, len(dataset))
    class_features: dict[int, list] = {v: [] for v in range(n_verb)}
    preds, gts = [], []

    def match_targets(targets):
        B = len(targets)
        obj_l = np.zeros((B, max_gt), np.int32)
        sub_l = np.full((B, max_gt), subject_category_id, np.int32)
        verb_l = np.zeros((B, max_gt, n_verb), np.float32)
        sub_b = np.zeros((B, max_gt, 4), np.float32)
        obj_b = np.zeros((B, max_gt, 4), np.float32)
        valid = np.zeros((B, max_gt), bool)
        for b, t in enumerate(targets):
            h, w = (float(x) for x in t["orig_size"])
            boxes = np.asarray(t["boxes"], np.float32).reshape(-1, 4)
            if not boxes.size:
                continue
            cxcywh = np.stack(
                [
                    (boxes[:, 0] + boxes[:, 2]) / 2.0 / w,
                    (boxes[:, 1] + boxes[:, 3]) / 2.0 / h,
                    (boxes[:, 2] - boxes[:, 0]) / w,
                    (boxes[:, 3] - boxes[:, 1]) / h,
                ],
                axis=1,
            )
            labels = np.asarray(t["labels"]).reshape(-1)
            pairs: list[tuple[int, int]] = []
            for s, o, v in np.asarray(t["hois"]).reshape(-1, 3):
                key = (int(s), int(o))
                if key in pairs:
                    m = pairs.index(key)
                else:
                    if len(pairs) >= max_gt:
                        continue
                    m = len(pairs)
                    pairs.append(key)
                    obj_l[b, m] = labels[int(o)]
                    sub_b[b, m] = cxcywh[int(s)]
                    obj_b[b, m] = cxcywh[int(o)]
                    valid[b, m] = True
                verb_l[b, m, int(v)] = 1.0
        return HOITargets(
            obj_labels=jnp.asarray(obj_l),
            sub_labels=jnp.asarray(sub_l),
            verb_labels=jnp.asarray(verb_l),
            sub_boxes=jnp.asarray(sub_b),
            obj_boxes=jnp.asarray(obj_b),
            valid=jnp.asarray(valid),
        )

    @jax.jit
    def _match(out, tgt, verb_valid):
        costs = hoi_matching_costs(
            out,
            tgt,
            verb_valid,
            cost_obj_class=cost_obj_class,
            cost_verb_class=cost_verb_class,
            cost_bbox=cost_bbox,
            cost_giou=cost_giou,
        )
        return hungarian_match(costs.total)

    def make_eval_batch(start):
        ids = range(start, min(start + batch_size, n_images))
        samples = [dataset[i] for i in ids]
        images = [s[0] for s in samples]
        targets = [s[1] for s in samples]
        B = len(images)
        H, W = bucket
        pixels = np.zeros((B, H, W, 3), np.asarray(images[0]).dtype)
        valid = np.zeros((B, H, W), bool)
        for b, im in enumerate(images):
            h, w = im.shape[:2]
            assert h <= H and w <= W, (
                f"eval image ({h},{w}) exceeds the fixed bucket ({H},{W})"
            )
            pixels[b, :h, :w] = im
            valid[b, :h, :w] = True
        text_emb = np.tile(feats[None], (B, 1, 1))
        text_valid = np.ones((B, n_obj + n_verb), bool)
        return pixels, valid, text_emb, text_valid, targets

    for pixels, valid, text_emb, text_valid, targets in prefetch_map(
        make_eval_batch, range(0, n_images, batch_size), num_workers=2
    ):
        out = apply_fn(
            params,
            jnp.asarray(pixels),
            jnp.asarray(valid),
            jnp.asarray(text_emb),
            jnp.asarray(text_valid),
            n_obj,
        )
        assert "verb_decoder_out" in out, (
            "apply_fn must expose the verb decoder hidden states as "
            "'verb_decoder_out' (reference: models/hoi.py:2173)"
        )
        tgt = match_targets(targets)
        match = np.asarray(
            _match(
                {
                    k: out[k]
                    for k in (
                        "pred_obj_logits",
                        "pred_verb_logits",
                        "pred_sub_boxes",
                        "pred_obj_boxes",
                    )
                },
                tgt,
                jnp.ones((len(targets), n_verb), bool),
            )
        )
        verb_feat = np.asarray(out["verb_decoder_out"], np.float32)
        tgt_valid = np.asarray(tgt.valid)
        tgt_verbs = np.asarray(tgt.verb_labels)
        for b in range(len(targets)):
            for m in np.nonzero(tgt_valid[b])[0]:
                q = int(match[b, m])
                for v in np.nonzero(tgt_verbs[b, m])[0]:
                    class_features[int(v)].append(verb_feat[b, q])

        orig = jnp.asarray(
            np.stack([t["orig_size"] for t in targets]).astype(np.float32)
        )
        post = postprocess_hoi(out, orig)
        preds.extend(to_image_results(post, subject_category_id))
        gts.extend(
            {
                "filename": t["filename"],
                "boxes": np.asarray(t["boxes"]),
                "labels": np.asarray(t["labels"]),
                "hois": np.asarray(t["hois"]),
            }
            for t in targets
        )

    stats = _run_hico_evaluator(dataset, preds, gts, n_obj, n_verb, use_nms_filter)
    if save_path is not None:
        np.savez_compressed(
            save_path,
            verb_class_dict=np.asarray(
                {v: np.asarray(f) for v, f in class_features.items()},
                dtype=object,
            ),
        )
    nonempty = {v: np.stack(f) for v, f in class_features.items() if f}
    analysis = analyze(nonempty) if nonempty else {
        "uniformity": 0.0, "alignment": 0.0, "n_classes": 0, "n_features": 0,
    }
    return stats, analysis, class_features


def _collect_predictions_sharded(
    apply_fn, params, dataset, feats, n_obj, n_images, batch_size,
    bucket, subject_category_id, zero_shot_subject_filter,
    rank, world, gather_fn, max_gt_boxes, max_gt_hois,
):
    """Strided-shard eval with fixed-shape all-gather + image-id dedupe.

    Every rank runs ceil(n/world) images wrap-padded to a multiple of
    batch_size (all shapes static), so `process_allgather` sees identical
    shapes on every process; duplicates vanish in the dedupe."""
    from rlipv2_tpu.parallel.dist_eval import (
        DistEvalBuffer,
        pad_gt_arrays,
        shard_indices,
        unpack_gt_arrays,
    )

    idx = shard_indices(n_images, rank, world)
    pad = (-len(idx)) % batch_size
    idx = idx + idx[:pad] if pad else idx

    buf = DistEvalBuffer()
    H, W = bucket
    for start in range(0, len(idx), batch_size):
        ids = idx[start : start + batch_size]
        samples = [dataset[i] for i in ids]
        images = [s[0] for s in samples]
        targets = [s[1] for s in samples]
        B = len(images)
        pixels = np.zeros((B, H, W, 3), np.asarray(images[0]).dtype)
        valid = np.zeros((B, H, W), bool)
        for b, im in enumerate(images):
            h, w = im.shape[:2]
            pixels[b, :h, :w] = im
            valid[b, :h, :w] = True
        text_emb = np.tile(feats[None], (B, 1, 1))
        text_valid = np.ones((B, len(feats)), bool)
        out = apply_fn(
            params, jnp.asarray(pixels), jnp.asarray(valid),
            jnp.asarray(text_emb), jnp.asarray(text_valid), n_obj,
        )
        orig = jnp.asarray(
            np.stack([t["orig_size"] for t in targets]).astype(np.float32)
        )
        post = postprocess_hoi(out, orig, subject_class=zero_shot_subject_filter)
        tree = {k: np.asarray(v) for k, v in post.items()}
        tree.update(pad_gt_arrays(targets, max_gt_boxes, max_gt_hois))
        buf.add(np.asarray(ids, np.int32), tree)

    _, tree = buf.gather_and_dedupe(gather_fn)
    gt_tree = {k: tree.pop(k) for k in list(tree) if k.startswith("gt_")}
    preds = to_image_results(
        tree, subject_category_id, zero_shot_subject_filter
    )
    gts = unpack_gt_arrays(gt_tree)
    return preds, gts


def _collect_predictions(
    apply_fn, params, dataset, cfg, text_encoder, batch_size, bucket,
    subject_category_id, max_images, sgg: bool = False,
):
    """Shared prediction collection for the V-COCO / OI-SGG eval loops."""
    from rlipv2_tpu.eval.postprocess import postprocess_sgg

    obj_texts = list(dataset.object_text) + ["no objects"]
    verb_texts = list(dataset.verb_text)
    n_obj = len(obj_texts)
    feats = text_encoder(obj_texts + verb_texts)

    n_images = len(dataset) if max_images is None else min(max_images, len(dataset))
    preds, gts = [], []
    for start in range(0, n_images, batch_size):
        samples = [dataset[i] for i in range(start, min(start + batch_size, n_images))]
        images = [s[0] for s in samples]
        targets = [s[1] for s in samples]
        B = len(images)
        H, W = bucket
        pixels = np.zeros((B, H, W, 3), np.asarray(images[0]).dtype)
        valid = np.zeros((B, H, W), bool)
        for b, im in enumerate(images):
            h, w = im.shape[:2]
            pixels[b, :h, :w] = im
            valid[b, :h, :w] = True
        text_emb = np.tile(feats[None], (B, 1, 1))
        text_valid = np.ones((B, len(feats)), bool)
        out = apply_fn(
            params, jnp.asarray(pixels), jnp.asarray(valid),
            jnp.asarray(text_emb), jnp.asarray(text_valid), n_obj,
        )
        orig = jnp.asarray(
            np.stack([t["orig_size"] for t in targets]).astype(np.float32)
        )
        if sgg and "pred_sub_logits" in out:
            post = postprocess_sgg(out, orig)
        else:
            post = postprocess_hoi(out, orig)
        preds.extend(to_image_results(post, subject_category_id))
        gts.extend(targets)
    return preds, gts


def evaluate_vcoco(
    apply_fn, params, dataset, cfg, text_encoder,
    batch_size: int = 8, bucket=(832, 1344), subject_category_id: int = 0,
    max_images: Optional[int] = None,
):
    """V-COCO role-AP evaluation (reference: engine.py's vcoco branch +
    datasets/vcoco_eval.py)."""
    from rlipv2_tpu.eval.vcoco_eval import VCOCOEvaluator

    preds, gts = _collect_predictions(
        apply_fn, params, dataset, cfg, text_encoder, batch_size, bucket,
        subject_category_id, max_images,
    )
    correct_mat = dataset.correct_mat
    if correct_mat is None:
        correct_mat = np.ones(
            (len(dataset.verb_text), len(dataset.object_text)), np.float64
        )
    gt_dicts = [
        {"boxes": np.asarray(t["boxes"]), "labels": np.asarray(t["labels"]),
         "hois": np.asarray(t["hois"])}
        for t in gts
    ]
    return VCOCOEvaluator(preds, gt_dicts, correct_mat).evaluate()


def evaluate_sgg(
    apply_fn, params, dataset, cfg, text_encoder,
    batch_size: int = 8, bucket=(832, 1344),
    use_nms_filter: bool = False, max_images: Optional[int] = None,
):
    """Open Images v6 SGG evaluation at top-50 AND top-100 with the
    composite score (reference: engine.py:472-569 evaluate_sgg_with_text
    runs the evaluator at both topK)."""
    from rlipv2_tpu.eval.oi_sgg_eval import OISGGEvaluator, score_wtd

    preds, gts = _collect_predictions(
        apply_fn, params, dataset, cfg, text_encoder, batch_size, bucket,
        subject_category_id=0, max_images=max_images, sgg=True,
    )
    gt_dicts = [
        {"filename": t.get("filename", ""), "boxes": np.asarray(t["boxes"]),
         "labels": np.asarray(t["labels"]), "rels": np.asarray(t["hois"])}
        for t in gts
    ]
    r50 = OISGGEvaluator(
        preds, gt_dicts, topk=50, use_nms_filter=use_nms_filter
    ).evaluate()
    r100 = OISGGEvaluator(
        preds, gt_dicts, topk=100, use_nms_filter=use_nms_filter
    ).evaluate()
    out = dict(r50)
    out.update(r100)
    out.update(score_wtd(r50, r100))
    return out
