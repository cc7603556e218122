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


def generate_pseudo_annotations(
    model,
    params,
    dataset,  # yields (img, target) with boxes/labels/candidates
    text_encoder,
    cfg,
    relation_threshold: float = 0.2,
    dataset_name: Optional[str] = None,
    max_images: Optional[int] = None,
) -> list:
    """Run the tagger over a dataset -> VG-format annotation list."""
    from rlipv2_tpu.models.parseda import RLIPParSeDA

    tagger_apply = jax.jit(
        lambda p, px, v, te, tv, tg: model.apply(
            p, px, v, te, tv, tg, jax.random.PRNGKey(0), cfg.max_obj_texts,
            training=False, method=RLIPParSeDA.forward_tagger,
        )
    )

    annos = []
    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    for i in range(n):
        img, target = dataset[i]
        h, w = img.shape[:2]
        valid = np.ones((h, w), bool)
        rels = tag_image(
            tagger_apply,
            params,
            img,
            valid,
            np.asarray(target["boxes"]),
            np.asarray(target["labels"]),
            target["relation_candidates"],
            target.get("object_texts", dataset.object_names),
            text_encoder,
            cfg,
            relation_threshold,
        )
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
