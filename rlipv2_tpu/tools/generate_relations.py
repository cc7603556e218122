"""Pseudo-relation generation with the trained R-Tagger.

Capability parity with the reference's offline tagger inference
(generate_relations_using_verb_tagger.py:554-1100 `verb_tagger_with_text`):
per image, BLIP-derived relation candidates — (sub, obj) box-pair groups
plus candidate relation texts — become tagger queries; the verb decoder's
sigmoid confidence scores every (pair, candidate) and survivors above
`relation_threshold` are written as VG-format relationships with a
"confidence" field, ready for MixedRelDataset (which thresholds them again
at load time, datasets/mixed_dataset.py:409-427).

Inputs per image:
  boxes:      (n, 4) cxcywh normalized GT boxes
  labels:     (n,) object labels in the tagger's object-text space
  candidates: list of (pairs, rel_texts) groups where pairs is a list of
              (sub_idx, obj_idx) into boxes and rel_texts a list of str.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rlipv2_tpu.structures import HOITargets


def tag_image(
    tagger_apply,
    params,
    pixels: np.ndarray,  # (H, W, 3) normalized float32
    pixel_valid: np.ndarray,
    boxes: np.ndarray,  # (n, 4) cxcywh normalized
    labels: np.ndarray,  # (n,)
    candidates: Sequence[tuple],
    object_texts: Sequence[str],
    text_encoder,  # CachedTextEncoder
    cfg,
    relation_threshold: float = 0.2,
) -> list:
    """Returns VG-format relationship dicts with confidences."""
    M = cfg.num_queries // 2
    n_obj_slots = cfg.max_obj_texts
    n_verb_slots = cfg.max_verb_texts
    relationships = []

    for pairs, rel_texts in candidates:
        if not pairs or not rel_texts:
            continue
        pairs = pairs[:M]
        rel_texts = list(rel_texts)[: n_verb_slots]

        sub_idx = [s for s, _ in pairs]
        obj_idx = [o for _, o in pairs]
        n = len(pairs)

        targets = HOITargets(
            obj_labels=jnp.asarray(
                np.pad(labels[obj_idx], (0, M - n)).astype(np.int32)
            )[None],
            sub_labels=jnp.asarray(
                np.pad(labels[sub_idx], (0, M - n)).astype(np.int32)
            )[None],
            verb_labels=jnp.zeros((1, M, n_verb_slots)),
            sub_boxes=jnp.asarray(
                np.pad(boxes[sub_idx], ((0, M - n), (0, 0))).astype(np.float32)
            )[None],
            obj_boxes=jnp.asarray(
                np.pad(boxes[obj_idx], ((0, M - n), (0, 0))).astype(np.float32)
            )[None],
            valid=jnp.asarray(np.arange(M) < n)[None],
        )

        # static text slots: objects (with no-object last) + candidates
        obj_slots = list(object_texts) + [""] * (
            n_obj_slots - 1 - len(object_texts)
        ) + ["no objects"]
        verb_slots = rel_texts + [""] * (n_verb_slots - len(rel_texts))
        feats = text_encoder([t if t else "." for t in obj_slots + verb_slots])
        text_emb = jnp.asarray(feats)[None]
        text_valid = np.zeros(n_obj_slots + n_verb_slots, bool)
        text_valid[: len(object_texts)] = True
        text_valid[n_obj_slots - 1] = True
        text_valid[n_obj_slots : n_obj_slots + len(rel_texts)] = True
        text_valid = jnp.asarray(text_valid)[None]

        out = tagger_apply(
            params,
            jnp.asarray(pixels)[None],
            jnp.asarray(pixel_valid)[None],
            text_emb,
            text_valid,
            targets,
        )
        conf = np.asarray(jax.nn.sigmoid(out["pred_verb_logits"][0]))  # (M, Vs)
        for p in range(n):
            for r, rel in enumerate(rel_texts):
                c = float(conf[p, r])
                if c >= relation_threshold:
                    relationships.append(
                        {
                            "subject_id": int(sub_idx[p]),
                            "object_id": int(obj_idx[p]),
                            "predicate": rel,
                            "confidence": c,
                        }
                    )
    return relationships


def _build_row(boxes, labels, pairs, rel_texts, object_texts, text_encoder,
               cfg):
    """One (image, candidate-group) row: padded targets + text slots.
    Returns (targets_np dict, text_emb, text_valid, n_pairs, rel_texts)."""
    M = cfg.num_queries // 2
    n_obj_slots = cfg.max_obj_texts
    n_verb_slots = cfg.max_verb_texts
    pairs = pairs[:M]
    rel_texts = list(rel_texts)[:n_verb_slots]
    sub_idx = [s for s, _ in pairs]
    obj_idx = [o for _, o in pairs]
    n = len(pairs)

    targets = {
        "obj_labels": np.pad(labels[obj_idx], (0, M - n)).astype(np.int32),
        "sub_labels": np.pad(labels[sub_idx], (0, M - n)).astype(np.int32),
        "verb_labels": np.zeros((M, n_verb_slots), np.float32),
        "sub_boxes": np.pad(boxes[sub_idx], ((0, M - n), (0, 0))).astype(np.float32),
        "obj_boxes": np.pad(boxes[obj_idx], ((0, M - n), (0, 0))).astype(np.float32),
        "valid": np.arange(M) < n,
    }
    obj_slots = list(object_texts) + [""] * (
        n_obj_slots - 1 - len(object_texts)
    ) + ["no objects"]
    verb_slots = rel_texts + [""] * (n_verb_slots - len(rel_texts))
    feats = text_encoder([t if t else "." for t in obj_slots + verb_slots])
    text_valid = np.zeros(n_obj_slots + n_verb_slots, bool)
    text_valid[: len(object_texts)] = True
    text_valid[n_obj_slots - 1] = True
    text_valid[n_obj_slots : n_obj_slots + len(rel_texts)] = True
    return targets, np.asarray(feats), text_valid, n, rel_texts, sub_idx, obj_idx


def tag_rows_batched(
    tagger_apply,
    params,
    rows: Sequence[dict],  # each: pixels, boxes, labels, pairs, rel_texts,
    #                               object_texts, out (list to append to)
    text_encoder,
    cfg,
    relation_threshold: float,
    batch_size: int = 8,
) -> None:
    """Score (image, candidate-group) rows in fixed-size padded batches —
    ONE jitted forward per batch of rows instead of one per group
    (VERDICT r2 item 8; the reference batches image groups the same way,
    generate_relations_using_verb_tagger.py:554-700). With ALIF fusion the
    text set is fused into the image encoding, so exact equivalence with
    the per-group path requires one batch ROW per group — batching trades
    dispatch/compile count, and rows of different images share the step.

    Results append to each row's `out` list in place."""
    if not rows:
        return
    for start in range(0, len(rows), batch_size):
        chunk = rows[start : start + batch_size]
        B = len(chunk)
        pad_to = batch_size  # static batch: wrap-pad with the first row
        built = [
            _build_row(
                r["boxes"], r["labels"], r["pairs"], r["rel_texts"],
                r["object_texts"], text_encoder, cfg,
            )
            for r in chunk
        ]
        Hm = max(r["pixels"].shape[0] for r in chunk)
        Wm = max(r["pixels"].shape[1] for r in chunk)
        pixels = np.zeros((pad_to, Hm, Wm, 3), np.float32)
        valid = np.zeros((pad_to, Hm, Wm), bool)
        for b, r in enumerate(chunk):
            h, w = r["pixels"].shape[:2]
            pixels[b, :h, :w] = r["pixels"]
            valid[b, :h, :w] = True
        for b in range(B, pad_to):  # wrap-pad
            pixels[b] = pixels[0]
            valid[b] = valid[0]

        def stack(key, dtype=None):
            a = np.stack([t[0][key] for t in built])
            if a.shape[0] < pad_to:
                a = np.concatenate(
                    [a, np.repeat(a[:1], pad_to - a.shape[0], axis=0)]
                )
            return a if dtype is None else a.astype(dtype)

        targets = HOITargets(
            obj_labels=jnp.asarray(stack("obj_labels")),
            sub_labels=jnp.asarray(stack("sub_labels")),
            verb_labels=jnp.asarray(stack("verb_labels")),
            sub_boxes=jnp.asarray(stack("sub_boxes")),
            obj_boxes=jnp.asarray(stack("obj_boxes")),
            valid=jnp.asarray(stack("valid")),
        )
        text_emb = np.stack([t[1] for t in built])
        text_val = np.stack([t[2] for t in built])
        if B < pad_to:
            text_emb = np.concatenate(
                [text_emb, np.repeat(text_emb[:1], pad_to - B, axis=0)]
            )
            text_val = np.concatenate(
                [text_val, np.repeat(text_val[:1], pad_to - B, axis=0)]
            )

        out = tagger_apply(
            params, jnp.asarray(pixels), jnp.asarray(valid),
            jnp.asarray(text_emb), jnp.asarray(text_val), targets,
        )
        conf_all = np.asarray(
            jax.nn.sigmoid(out["pred_verb_logits"].astype(np.float32))
        )
        for b, (r, (tgt, _, _, n, rel_texts, sub_idx, obj_idx)) in enumerate(
            zip(chunk, built)
        ):
            conf = conf_all[b]
            for p in range(n):
                for ri, rel in enumerate(rel_texts):
                    c = float(conf[p, ri])
                    if c >= relation_threshold:
                        r["out"].append(
                            {
                                "subject_id": int(sub_idx[p]),
                                "object_id": int(obj_idx[p]),
                                "predicate": rel,
                                "confidence": c,
                            }
                        )


def generate_pseudo_annotations(
    model,
    params,
    dataset,  # yields (img, target) with boxes/labels/candidates
    text_encoder,
    cfg,
    relation_threshold: float = 0.2,
    dataset_name: Optional[str] = None,
    max_images: Optional[int] = None,
    batch_size: int = 8,
) -> list:
    """Run the tagger over a dataset -> VG-format annotation list.

    All candidate groups of all images are flattened into rows and scored
    in fixed-size batched forwards (tag_rows_batched) — one model call per
    `batch_size` groups, not one per group."""
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    tagger_apply = jax.jit(
        lambda p, px, v, te, tv, tg: model.apply(
            p, px, v, te, tv, tg, jax.random.PRNGKey(0), cfg.max_obj_texts,
            training=False, method=RLIPParSeDA.forward_tagger,
        )
    )

    annos = []
    rows = []
    per_image_rels = []
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for i in range(n):
        img, target = dataset[i]
        rels: list = []
        per_image_rels.append(rels)
        boxes = np.asarray(target["boxes"])
        labels = np.asarray(target["labels"])
        obj_texts = target.get("object_texts", dataset.object_names)
        for pairs, rel_texts in target["relation_candidates"]:
            if not pairs or not rel_texts:
                continue
            rows.append(
                {
                    "pixels": img,
                    "boxes": boxes,
                    "labels": labels,
                    "pairs": pairs,
                    "rel_texts": rel_texts,
                    "object_texts": obj_texts,
                    "out": rels,
                }
            )
    tag_rows_batched(
        tagger_apply, params, rows, text_encoder, cfg, relation_threshold,
        batch_size=batch_size,
    )

    for i in range(n):
        img, target = dataset[i]
        h, w = img.shape[:2]
        rels = per_image_rels[i]
        x0y0 = None  # boxes stay normalized cxcywh; convert to VG xywh px
        objects = []
        for oid, (b, l) in enumerate(zip(target["boxes"], target["labels"])):
            cx, cy, bw, bh = (float(v) for v in b)
            objects.append(
                {
                    "object_id": oid,
                    "x": (cx - bw / 2) * w,
                    "y": (cy - bh / 2) * h,
                    "w": bw * w,
                    "h": bh * h,
                    "names": dataset.object_names[int(l)],
                }
            )
        anno = {
            "image_id": target["image_id"],
            "objects": objects,
            "relationships": rels,
        }
        if dataset_name:
            anno["dataset"] = dataset_name
        annos.append(anno)
    return annos


def deduplicate_relationships(annos: list) -> list:
    """Drop duplicate (subject, object, predicate) relationships, keeping
    the highest-confidence copy — the reference's post-tagger filter
    (datasets/rlipv2_helper/tagger_helper.py:29-73
    `deduplicate_verb_tagger_output`). Faithful to its quirk: every copy
    whose confidence EQUALS the max survives (exact ties keep both).
    Mutates and returns `annos`."""
    for anno in annos:
        rels = anno["relationships"]
        max_conf: dict = {}
        for rel in rels:
            key = (rel["subject_id"], rel["object_id"], rel["predicate"])
            c = rel["confidence"]
            if key not in max_conf or c > max_conf[key]:
                max_conf[key] = c
        anno["relationships"] = [
            rel
            for rel in rels
            if rel["confidence"]
            == max_conf[(rel["subject_id"], rel["object_id"], rel["predicate"])]
        ]
    return annos


def merge_tagger_segments(json_list, dataset_change_to=None,
                          save_merged_file=None) -> list:
    """Concatenate tagger-output segments (e.g. the 4 O365 shards) into one
    annotation list, optionally restamping the "dataset" field — the
    reference's `merge_segments_from_verb_tagger`
    (datasets/rlipv2_helper/tagger_helper.py:76-110), which appends every
    segment entry verbatim (duplicated image_ids are reported, not
    dropped)."""
    import json
    from pathlib import Path

    annos: list = []
    for jf in json_list:
        annos += json.loads(Path(jf).read_text())
    if dataset_change_to is not None:
        for anno in annos:
            anno["dataset"] = dataset_change_to
    if save_merged_file:
        Path(save_merged_file).write_text(json.dumps(annos))
    return annos
