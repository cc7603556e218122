"""COCO / Objects365 dataset readers — detection and tagger-input views.

Capability parity with the reference (no pycocotools dependency — the
COCO json is parsed directly):
  * CocoDetectionDataset — plain COCO-format detection reader
    (reference: datasets/coco.py:29-45 `CocoDetection` +
    `ConvertCocoPolysToMask` :308-377: drop iscrowd, xywh -> xyxy clamped
    to the image, drop degenerate boxes, keep category ids).
  * CocoRelDataset — the R-Tagger INPUT dataset: GT boxes + per-image
    BLIP-derived relation-candidate groups from a
    `vg_rel_texts_for_*_images` json keyed by str(image_id); images
    without candidates are dropped (reference: datasets/coco.py:241-287
    `CocoRelDetection`).
  * O365 support — `image_id_to_filepath` indirection for the Objects365
    on-disk layout (reference: datasets/o365.py:20-75).
  * CocoRLIPDataset — single-dataset pseudo-relation pretraining over a
    VG-format json with tagger-confidence thresholding (reference:
    datasets/coco.py:46-240 `CocoRLIPDetection`) — a thin alias over the
    VG reader, which already implements thresholding + pair-overlap.

__getitem__ returns (image HWC float32 in [0,1]-normalized space via the
shared HOITransform, target dict) matching this repo's dataset contract
(data/hico.py); tagger targets carry `relation_candidates` as a list of
(pairs, rel_texts) groups, the contract `tools/generate_relations.py`
consumes.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np


def _load_image(path):
    from PIL import Image

    im = Image.open(path)
    im.load()
    return im if im.mode == "RGB" else im.convert("RGB")  # HOITransform input


class CocoDetectionDataset:
    """Plain COCO-format detection dataset."""

    def __init__(
        self,
        img_folder,
        ann_file,
        transforms=None,
        image_id_to_filepath: Optional[dict | str | Path] = None,
    ):
        self.img_folder = Path(img_folder)
        self.transforms = transforms
        with open(ann_file) as f:
            coco = json.load(f)
        self.images = {im["id"]: im for im in coco["images"]}
        self.categories = {
            c["id"]: c["name"] for c in coco.get("categories", [])
        }
        # contiguous label space + names, the tagger text contract
        # (reference remaps COCO ids via coco_obj_label_to_80,
        # generate_relations_using_verb_tagger.py:596)
        self.cat_ids = sorted(self.categories)
        self._cat_to_contig = {c: i for i, c in enumerate(self.cat_ids)}
        self.object_names = [self.categories[c] for c in self.cat_ids]
        anns: dict[int, list] = {im_id: [] for im_id in self.images}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0) == 1:
                continue
            anns.setdefault(a["image_id"], []).append(a)
        self.anns = anns
        self.ids = sorted(self.images)
        if image_id_to_filepath is not None and not isinstance(
            image_id_to_filepath, dict
        ):
            with open(image_id_to_filepath) as f:
                image_id_to_filepath = json.load(f)
        self.image_id_to_filepath = image_id_to_filepath

    def __len__(self):
        return len(self.ids)

    def _path(self, image_id: int) -> Path:
        if self.image_id_to_filepath is not None:
            # Objects365 layout (reference: datasets/o365.py:26-32)
            return self.img_folder / self.image_id_to_filepath[str(image_id)]
        return self.img_folder / self.images[image_id]["file_name"]

    def _target(self, image_id: int, h: int, w: int) -> dict:
        boxes, labels = [], []
        for a in self.anns.get(image_id, []):
            x, y, bw, bh = a["bbox"]
            x0 = min(max(x, 0.0), w)
            y0 = min(max(y, 0.0), h)
            x1 = min(max(x + bw, 0.0), w)
            y1 = min(max(y + bh, 0.0), h)
            if x1 > x0 and y1 > y0:
                boxes.append([x0, y0, x1, y1])
                labels.append(
                    self._cat_to_contig.get(
                        a["category_id"], a["category_id"]
                    )
                )
        return {
            "image_id": image_id,
            "orig_size": np.array([h, w], np.int64),
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64),
        }

    def __getitem__(self, idx: int):
        image_id = self.ids[idx]
        img = _load_image(self._path(image_id))
        w, h = img.size
        target = self._target(image_id, h, w)
        if self.transforms is not None:
            from rlipv2_tpu.data.transforms import normalize_boxes

            img, target = self.transforms(img, target)
            # downstream (tagger tooling) consumes normalized cxcywh
            # like the reference's Normalize (datasets/transforms.py)
            target["boxes"] = normalize_boxes(
                target["boxes"], img.shape[0], img.shape[1]
            )
        else:
            img = np.asarray(img)  # no-transform contract stays numpy
        return img, target


class CocoRelDataset(CocoDetectionDataset):
    """Tagger-input dataset: GT boxes + BLIP relation candidates.

    `rel_candidates_file` is the `vg_rel_texts_for_coco_images`-style json
    {str(image_id): [[pairs, rel_texts], ...]} where pairs are (sub, obj)
    GT-box index lists (reference: datasets/coco.py:258-287,
    generate_relations_using_verb_tagger.py:587-614 consumption)."""

    def __init__(
        self,
        img_folder,
        ann_file,
        rel_candidates_file,
        transforms=None,
        image_id_to_filepath=None,
    ):
        super().__init__(img_folder, ann_file, transforms, image_id_to_filepath)
        if isinstance(rel_candidates_file, dict):
            self.img_rels = rel_candidates_file
        else:
            with open(rel_candidates_file) as f:
                self.img_rels = json.load(f)
        # drop images without any relation-text candidates
        # (reference: datasets/coco.py:263-268)
        self.ids = [i for i in self.ids if str(i) in self.img_rels]

    def __getitem__(self, idx: int):
        img, target = super().__getitem__(idx)
        cands = self.img_rels[str(target["image_id"])]
        target["relation_candidates"] = [
            (list(map(tuple, pairs)), list(rels)) for pairs, rels in cands
        ]
        return img, target


def build_coco_rlip(
    anno_file,
    img_folders: dict,
    num_queries: int,
    transforms=None,
    relation_threshold: float = 0.0,
    pair_overlap: bool = False,
):
    """Single-dataset COCO pseudo-relation pretraining: a VG-format json
    (objects + tagger relationships with `confidence`) consumed by the VG
    reader's thresholding/pair-overlap machinery (reference:
    datasets/coco.py:46-240 `CocoRLIPDetection` duplicates
    MixedRelDetection's logic; here it IS the same reader)."""
    from rlipv2_tpu.data.vg import VGRelDataset

    return VGRelDataset(
        anno_file,
        img_folders,
        num_queries=num_queries,
        transforms=transforms,
        relation_threshold=relation_threshold,
        pair_overlap=pair_overlap,
    )
