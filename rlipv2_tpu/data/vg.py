"""VG-format relational pretraining datasets + mixed-dataset machinery.

Capability parity:
  * VGRelDataset — reference datasets/vg.py:37-247 `VGRelDetection`:
    scene-graph JSON (objects[x, y, w, h, names], relationships[subject_id,
    object_id, predicate]), per-image label space from the annotation
    (`unique_name_dict_from_anno`) or the global keep-names list, per-pair
    multi-hot predicate labels, and the per-image obj/verb text lists the
    engine merges across the batch;
  * MixedRelDataset — reference datasets/mixed_dataset.py:364-777
    `MixedRelDetection`: one merged VG-format JSON spanning VG + pseudo-
    labelled COCO/O365/HICO, tagger-confidence thresholding
    (`relation_threshold`, :409-427), pair-overlap filtering (:429-455),
    relation-less image dropping (:468-474), per-source image-folder
    resolution (:500-518);
  * keep-names frequency tables — reference generate_keep_names_freq /
    fuse_multi_keep_names_freq (used by ConcatDataset :223-246), feeding
    'freq' negative text sampling;
  * batch_iterative_indices — reference BatchIterativeDistributedSampler
    (datasets/mixed_dataset.py:48-220): the anchor (first) dataset defines
    the epoch; whole per-rank batches are interleaved between datasets
    following `iterative_paradigm` (e.g. "0,1,2"), so gradient accumulation
    sees one dataset per micro-batch.
"""

from __future__ import annotations

import json
import random
from collections import OrderedDict
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from rlipv2_tpu.data.transforms import HOITransform


def unique_names_from_anno(objects_anno, relationships_anno):
    """Per-image label spaces in first-appearance order (reference
    unique_name_dict_from_anno)."""
    obj_unique = OrderedDict()
    for o in objects_anno:
        if o["names"] not in obj_unique:
            obj_unique[o["names"]] = len(obj_unique)
    rel_unique = OrderedDict()
    for r in relationships_anno:
        if r["predicate"] not in rel_unique:
            rel_unique[r["predicate"]] = len(rel_unique)
    return obj_unique, rel_unique


def generate_keep_names_freq(annotations):
    """Label frequency tables from VG-format annotations."""
    obj_freq: OrderedDict = OrderedDict()
    rel_freq: OrderedDict = OrderedDict()
    for anno in annotations:
        for o in anno["objects"]:
            obj_freq[o["names"]] = obj_freq.get(o["names"], 0) + 1
        for r in anno["relationships"]:
            rel_freq[r["predicate"]] = rel_freq.get(r["predicate"], 0) + 1
    return {
        "object_names": list(obj_freq.keys()),
        "relationship_names": list(rel_freq.keys()),
        "object_freq": obj_freq,
        "relationship_freq": rel_freq,
    }


def fuse_keep_names_freq(tables: Sequence[dict]) -> dict:
    obj_freq: OrderedDict = OrderedDict()
    rel_freq: OrderedDict = OrderedDict()
    for t in tables:
        for k, v in t["object_freq"].items():
            obj_freq[k] = obj_freq.get(k, 0) + v
        for k, v in t["relationship_freq"].items():
            rel_freq[k] = rel_freq.get(k, 0) + v
    return {
        "object_names": list(obj_freq.keys()),
        "relationship_names": list(rel_freq.keys()),
        "object_freq": obj_freq,
        "relationship_freq": rel_freq,
    }


def boxes_overlap(b1, b2) -> bool:
    """xywh overlap check (reference check_overlap for pair_overlap)."""
    ax0, ay0, ax1, ay1 = b1[0], b1[1], b1[0] + b1[2], b1[1] + b1[3]
    bx0, by0, bx1, by1 = b2[0], b2[1], b2[0] + b2[2], b2[1] + b2[3]
    return not (ax1 <= bx0 or bx1 <= ax0 or ay1 <= by0 or by1 <= ay0)


class VGRelDataset:
    """VG-format relational dataset; also the base for pseudo-labelled
    mixes. Images resolve per annotation 'dataset' field."""

    def __init__(
        self,
        anno_file,
        folders: dict,  # {'vg': Path, 'coco2017': Path, 'o365': Path, 'hico': Path}
        num_queries: int = 200,
        transforms: Optional[HOITransform] = None,
        use_all_text_labels: bool = False,
        keep_names: Optional[dict] = None,  # global names/freq tables
        relation_threshold: float = 0.0,
        pair_overlap: bool = False,
        drop_relationless: bool = True,
        image_id_to_filepath_o365: Optional[dict] = None,
    ):
        with open(anno_file) as f:
            self.annotations = json.load(f)
        self.folders = {k: Path(v) for k, v in folders.items() if v is not None}
        self.num_pairs = num_queries // 2
        self.transforms = transforms or HOITransform(train=True, normalize=False)
        self.use_all_text_labels = use_all_text_labels
        self.o365_paths = image_id_to_filepath_o365
        if self.o365_paths is None and "o365" in self.folders:
            p = self.folders["o365"] / "image_id_to_filepath.json"
            if p.exists():
                self.o365_paths = json.loads(p.read_text())

        # tagger-confidence thresholding (VG rels have no 'confidence' and
        # are always kept)
        if relation_threshold > 0.0:
            for anno in self.annotations:
                anno["relationships"] = [
                    r
                    for r in anno["relationships"]
                    if r.get("confidence", 1.0) >= relation_threshold
                ]
        if pair_overlap:
            for anno in self.annotations:
                objs = {o["object_id"]: o for o in anno["objects"]}
                kept = []
                for r in anno["relationships"]:
                    if "overlap" in r:
                        if r["overlap"] is True:
                            kept.append(r)
                    else:
                        s, o = objs[r["subject_id"]], objs[r["object_id"]]
                        if boxes_overlap(
                            (s["x"], s["y"], s["w"], s["h"]),
                            (o["x"], o["y"], o["w"], o["h"]),
                        ):
                            kept.append(r)
                anno["relationships"] = kept

        self.ids = [
            i
            for i in range(len(self.annotations))
            if (not drop_relationless) or len(self.annotations[i]["relationships"])
        ]

        if keep_names is None:
            keep_names = generate_keep_names_freq(self.annotations)
        self.object_names = keep_names["object_names"]
        self.relationship_names = keep_names["relationship_names"]
        self.object_freq = keep_names.get("object_freq", {})
        self.relationship_freq = keep_names.get("relationship_freq", {})

    def __len__(self):
        return len(self.ids)

    def _open_image(self, anno) -> np.ndarray:
        from PIL import Image

        ds = anno.get("dataset")
        if ds == "coco2017":
            name = str(anno["image_id"]).zfill(12) + ".jpg"
            split = anno.get("data_split", "train2017")
            path = self.folders["coco2017"] / split / name
        elif ds == "o365":
            path = self.folders["o365"] / self.o365_paths[str(anno["image_id"])]
        elif ds == "hico":
            path = self.folders["hico"] / anno["image_id"]
        else:
            path = self.folders["vg"] / (str(anno["image_id"]) + ".jpg")
        img = Image.open(path)
        return img if img.mode == "RGB" else img.convert("RGB")

    def __getitem__(self, idx):
        anno = self.annotations[self.ids[idx]]
        objects_anno = anno["objects"]
        relationships_anno = anno["relationships"][: self.num_pairs]

        img = self._open_image(anno)
        w, h = img.size

        boxes = np.asarray(
            [
                [o["x"], o["y"], o["x"] + o["w"], o["y"] + o["h"]]
                for o in objects_anno
            ],
            np.float32,
        ).reshape(-1, 4)
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)

        if self.use_all_text_labels:
            obj_unique = OrderedDict(
                (n, i) for i, n in enumerate(self.object_names)
            )
            rel_unique = OrderedDict(
                (n, i) for i, n in enumerate(self.relationship_names)
            )
        else:
            obj_unique, rel_unique = unique_names_from_anno(
                objects_anno, relationships_anno
            )

        labels = np.asarray(
            [obj_unique[o["names"]] for o in objects_anno], np.int64
        )
        t = {
            "boxes": boxes,
            "labels": labels,
            "box_indices": np.arange(len(boxes)),
        }
        img, t = self.transforms(img, t)
        kept = list(t["box_indices"])

        # object_id -> local index
        oid_to_local = {o["object_id"]: i for i, o in enumerate(objects_anno)}

        sub_labels, obj_labels, verb_labels = [], [], []
        sub_boxes, obj_boxes = [], []
        pairs = []
        for rel in relationships_anno:
            s_loc = oid_to_local[rel["subject_id"]]
            o_loc = oid_to_local[rel["object_id"]]
            if s_loc not in kept or o_loc not in kept:
                continue
            pair = (s_loc, o_loc)
            p_idx = rel_unique[rel["predicate"]]
            if pair in pairs:
                verb_labels[pairs.index(pair)][p_idx] = 1.0
            else:
                pairs.append(pair)
                ks, ko = kept.index(s_loc), kept.index(o_loc)
                sub_labels.append(t["labels"][ks])
                obj_labels.append(t["labels"][ko])
                vl = np.zeros(len(rel_unique), np.float32)
                vl[p_idx] = 1.0
                verb_labels.append(vl)
                sub_boxes.append(t["boxes"][ks])
                obj_boxes.append(t["boxes"][ko])

        n = len(pairs)
        target = {
            "orig_size": np.array([h, w], np.int64),
            "image_id": anno["image_id"],
            "obj_classes": list(obj_unique.keys()),
            "verb_classes": list(rel_unique.keys()),
            "obj_labels": np.asarray(obj_labels, np.int64).reshape(n),
            "sub_labels": np.asarray(sub_labels, np.int64).reshape(n),
            "verb_labels": (
                np.stack(verb_labels)
                if n
                else np.zeros((0, len(rel_unique)), np.float32)
            ),
            "sub_boxes": np.asarray(sub_boxes, np.float32).reshape(n, 4),
            "obj_boxes": np.asarray(obj_boxes, np.float32).reshape(n, 4),
        }
        if getattr(self, "_expose_kept", False):
            # tagger subclass needs the surviving boxes for negative pairs
            target["_kept"] = {
                "boxes": t["boxes"],
                "labels": t["labels"],
                "kept": kept,
                "pairs": pairs,
            }
        return img, target


class VGRelTaggerDataset(VGRelDataset):
    """R-Tagger training dataset (reference `VGRelTagger`,
    datasets/vg.py:250-533): each item fills up to num_queries//2 query-pair
    slots with the GT (positive) pairs plus NEGATIVE pairs sampled without
    replacement from permutations of the transform-surviving boxes; a
    negative pair keeps its GT sub/obj labels and boxes but carries an
    all-zero verb-label vector, so the tagger learns to score candidate
    relations against arbitrary box pairs."""

    def __init__(self, *args, seed: int = 0, **kwargs):
        super().__init__(*args, **kwargs)
        self._expose_kept = True
        self._rng = random.Random(seed)

    def __getitem__(self, idx):
        img, target = super().__getitem__(idx)
        info = target.pop("_kept")
        boxes, labels, kept, pairs = (
            info["boxes"], info["labels"], info["kept"], info["pairs"],
        )
        num_pairs = self.num_pairs
        n_pos = len(pairs)
        n_boxes = len(kept)
        pos_set = {(kept.index(s), kept.index(o)) for s, o in pairs}
        possible = [
            (i, j) for i in range(n_boxes) for j in range(n_boxes) if i != j
        ]
        negs = [p for p in possible if p not in pos_set]

        fields = ("obj_labels", "sub_labels", "verb_labels", "sub_boxes",
                  "obj_boxes")
        if n_pos >= num_pairs:
            keep_pos = self._rng.sample(range(n_pos), num_pairs)
            for k in fields:
                target[k] = target[k][keep_pos]
            negs = []
        elif len(possible) >= num_pairs:
            # enough material to fill every slot (reference branch at
            # datasets/vg.py:486-490)
            negs = self._rng.sample(negs, num_pairs - n_pos)
        # else: fewer possible pairs than slots -> use ALL negatives and
        # leave the rest padded (masked downstream)

        if negs:
            V = target["verb_labels"].shape[1]
            target["sub_labels"] = np.concatenate(
                [target["sub_labels"],
                 np.asarray([labels[i] for i, _ in negs], np.int64)]
            )
            target["obj_labels"] = np.concatenate(
                [target["obj_labels"],
                 np.asarray([labels[j] for _, j in negs], np.int64)]
            )
            target["verb_labels"] = np.concatenate(
                [target["verb_labels"], np.zeros((len(negs), V), np.float32)]
            )
            target["sub_boxes"] = np.concatenate(
                [target["sub_boxes"], np.stack([boxes[i] for i, _ in negs])]
            )
            target["obj_boxes"] = np.concatenate(
                [target["obj_boxes"], np.stack([boxes[j] for _, j in negs])]
            )
        return img, target


class ConcatRelDataset:
    """Concatenate VG-format datasets, fusing their frequency tables
    (reference ConcatDataset, datasets/mixed_dataset.py:223-246)."""

    def __init__(self, datasets: Sequence[VGRelDataset]):
        self.datasets = list(datasets)
        self.cumsizes = np.cumsum([len(d) for d in self.datasets])
        fused = fuse_keep_names_freq(
            [
                {
                    "object_freq": d.object_freq,
                    "relationship_freq": d.relationship_freq,
                }
                for d in self.datasets
            ]
        )
        self.object_names = fused["object_names"]
        self.relationship_names = fused["relationship_names"]
        self.object_freq = fused["object_freq"]
        self.relationship_freq = fused["relationship_freq"]

    def __len__(self):
        return int(self.cumsizes[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self.cumsizes, idx, side="right"))
        prev = 0 if d == 0 else int(self.cumsizes[d - 1])
        return self.datasets[d][idx - prev]


def batch_iterative_indices(
    dataset_sizes: Sequence[int],
    batch_size: int,
    iterative_paradigm: Sequence[int],
    num_replicas: int = 1,
    rank: int = 0,
    shuffle: bool = True,
    seed: int = 0,
    epoch: int = 0,
):
    """Per-rank list of whole-batch GLOBAL index lists, alternating between
    datasets per `iterative_paradigm` (e.g. [0, 1, 2] -> a VG batch, a COCO
    batch, an O365 batch, then the next VG batch ...). The first dataset is
    the anchor: its size defines the epoch; extra datasets are truncated to
    anchor_size * (times listed in the paradigm)."""
    import math

    rng = random.Random(seed + epoch)
    anchor = dataset_sizes[0]
    num_samples = math.ceil(anchor / num_replicas)
    total = num_samples * num_replicas

    def perm(n):
        idx = list(range(n))
        if shuffle:
            rng.shuffle(idx)
        return idx

    indices = perm(anchor)
    pad = total - len(indices)
    if pad:
        reps = math.ceil(pad / len(indices))
        indices += (indices * reps)[:pad]

    all_indices = [indices]
    start = anchor
    for d in range(1, len(dataset_sizes)):
        reps = sum(1 for p in iterative_paradigm if p == d)
        di = [i + start for i in perm(dataset_sizes[d])]
        all_indices.append(di[: anchor * reps])
        start += dataset_sizes[d]

    out = []
    n_batches = math.ceil(num_samples / batch_size)
    start_flag = [0] * len(all_indices)
    for _ in range(n_batches):
        take = min(
            num_replicas * batch_size, len(all_indices[0]) - start_flag[0]
        )
        for d in iterative_paradigm:
            sl = all_indices[d][start_flag[d] : start_flag[d] + take]
            out.append(sl[rank::num_replicas])
            start_flag[d] += take
    return out
