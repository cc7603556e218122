"""HICO-DET dataset (host side).

Capability parity with `HICODetection` (reference: datasets/hico.py:32-261):
  * same annotation JSON schema (file_name / annotations[bbox, category_id]
    / hoi_annotation[subject_id, object_id, category_id]);
  * COCO 1-90 -> 0-79 id remap via VALID_OBJ_IDS;
  * per-pair multi-hot verb labels with duplicate (sub, obj) pairs merged;
  * train-time box clamping + degenerate-box dropping, with HOI pairs
    whose boxes were dropped by crops removed;
  * rare (<10 occurrences) / non-rare split (reference :192-211);
  * zero-shot UC-RF / UC-NF / UO seen/unseen lists (reference :213-257);
  * correct_mat loading;
  * annotation-file selection incl. few-shot 1%/10% and zero-shot variants
    (reference :529-623).

Images load lazily with PIL; every __getitem__ returns numpy arrays ready
for data/collate.py. No torch anywhere.
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Optional

import numpy as np

from rlipv2_tpu.data.transforms import HOITransform
from rlipv2_tpu.data.vocab import (
    HICO_OBJECT_NAMES,
    HICO_VERB_NAMES,
    UNSEEN_HOI_IDX,
    VALID_OBJ_IDS,
    VALID_VERB_IDS,
)


class HICODataset:
    rel_key = "hoi_annotation"
    num_verb_classes = len(VALID_VERB_IDS)
    # V-COCO mode: GT object_id -1 means "no object" -> no-object class +
    # all-zero object box (reference: datasets/vcoco.py:95-135)
    allow_no_object_pairs = False
    no_object_class = len(VALID_OBJ_IDS)

    def __init__(
        self,
        image_set: str,  # train | val
        img_folder,
        anno_file,
        num_queries: int = 100,
        transforms: Optional[HOITransform] = None,
        subject_category_id: int = 0,
        build_verb_hm: bool = False,
    ):
        self.image_set = image_set
        self.img_folder = Path(img_folder)
        with open(anno_file) as f:
            self.annotations = json.load(f)
        self.num_queries = num_queries
        self.transforms = (
            transforms
            if transforms is not None
            else HOITransform(train=image_set == "train", normalize=False)
        )
        self.subject_category_id = subject_category_id
        # DETRHOIhm variant: also emit the CenterNet-style GT verb heatmap
        # (reference datasets/hico.py:376-407 under --DETRHOIhm)
        self.build_verb_hm = build_verb_hm

        if image_set == "train":
            self.ids = []
            for idx, anno in enumerate(self.annotations):
                for hoi in anno[self.rel_key]:
                    if hoi["subject_id"] >= len(anno["annotations"]) or hoi[
                        "object_id"
                    ] >= len(anno["annotations"]):
                        break
                else:
                    self.ids.append(idx)
        else:
            self.ids = list(range(len(self.annotations)))

        self.object_text = list(HICO_OBJECT_NAMES)
        self.verb_text = list(HICO_VERB_NAMES)
        self.rare_triplets: list = []
        self.non_rare_triplets: list = []
        self.correct_mat: Optional[np.ndarray] = None

    def _obj_index(self, category_id: int) -> int:
        return VALID_OBJ_IDS.index(category_id)

    def _verb_index(self, category_id: int) -> int:
        return VALID_VERB_IDS.index(category_id)

    def __len__(self):
        return len(self.ids)

    def load_image(self, file_name):
        """Decoded PIL image in RGB (stays PIL so the transform pipeline
        runs entirely in PIL's C loops; convert() only when needed)."""
        from PIL import Image

        img = Image.open(self.img_folder / file_name)
        if img.mode != "RGB":
            img = img.convert("RGB")
        return img

    def __getitem__(self, idx):
        anno = self.annotations[self.ids[idx]]
        img = self.load_image(anno["file_name"])
        w, h = img.size

        ann_list = anno["annotations"]
        if self.image_set == "train" and len(ann_list) > self.num_queries:
            ann_list = ann_list[: self.num_queries]

        boxes = np.asarray(
            [obj["bbox"] for obj in ann_list], np.float32
        ).reshape(-1, 4)
        classes = np.asarray(
            [self._obj_index(obj["category_id"]) for obj in ann_list], np.int64
        )

        target = {"orig_size": np.array([h, w], np.int64), "filename": anno["file_name"]}

        if self.image_set == "train":
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, w)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, h)
            keep = (boxes[:, 3] > boxes[:, 1]) & (boxes[:, 2] > boxes[:, 0])
            t = {
                "boxes": boxes[keep],
                "labels": classes[keep],
                "box_indices": np.nonzero(keep)[0],
            }
            img, t = self.transforms(img, t)
            kept = list(t["box_indices"])

            obj_labels, verb_labels, sub_boxes, obj_boxes = [], [], [], []
            pairs = []
            for hoi in anno[self.rel_key]:
                no_obj = self.allow_no_object_pairs and hoi["object_id"] == -1
                if hoi["subject_id"] not in kept or (
                    not no_obj and hoi["object_id"] not in kept
                ):
                    continue
                pair = (hoi["subject_id"], hoi["object_id"])
                v_idx = self._verb_index(hoi["category_id"])
                if pair in pairs:
                    verb_labels[pairs.index(pair)][v_idx] = 1.0
                else:
                    pairs.append(pair)
                    if no_obj:
                        obj_labels.append(self.no_object_class)
                        obj_boxes.append(np.zeros(4, np.float32))
                    else:
                        obj_labels.append(t["labels"][kept.index(hoi["object_id"])])
                        obj_boxes.append(t["boxes"][kept.index(hoi["object_id"])])
                    vl = np.zeros(self.num_verb_classes, np.float32)
                    vl[v_idx] = 1.0
                    verb_labels.append(vl)
                    sub_boxes.append(t["boxes"][kept.index(hoi["subject_id"])])

            n = len(pairs)
            target.update(
                obj_labels=np.asarray(obj_labels, np.int64).reshape(n),
                sub_labels=np.full(n, self.subject_category_id, np.int64),
                verb_labels=(
                    np.stack(verb_labels)
                    if n
                    else np.zeros((0, self.num_verb_classes), np.float32)
                ),
                sub_boxes=np.asarray(sub_boxes, np.float32).reshape(n, 4),
                obj_boxes=np.asarray(obj_boxes, np.float32).reshape(n, 4),
                obj_classes=self.object_text,
                verb_classes=self.verb_text,
            )
            if self.build_verb_hm:
                from rlipv2_tpu.data.heatmap import make_verb_heatmap

                target["verb_hm"] = make_verb_heatmap(
                    target["sub_boxes"], target["obj_boxes"],
                    img.shape[:2],
                )
            return img, target

        # val: GT kept in original pixel space for the evaluator
        img, _ = self.transforms(img, {"boxes": np.zeros((0, 4), np.float32), "labels": np.zeros(0, np.int64)})
        hois = np.asarray(
            [
                (h_["subject_id"], h_["object_id"], self._verb_index(h_["category_id"]))
                for h_ in anno[self.rel_key]
            ],
            np.int64,
        ).reshape(-1, 3)
        target.update(boxes=boxes, labels=classes, hois=hois, id=idx)
        return img, target

    # ----------------------- split bookkeeping ------------------------ #

    def set_rare_hois(self, anno_file):
        with open(anno_file) as f:
            annotations = json.load(f)
        counts = defaultdict(int)
        for anno in annotations:
            for hoi in anno["hoi_annotation"]:
                bboxes = anno["annotations"]
                triplet = (
                    VALID_OBJ_IDS.index(bboxes[hoi["subject_id"]]["category_id"]),
                    VALID_OBJ_IDS.index(bboxes[hoi["object_id"]]["category_id"]),
                    VALID_VERB_IDS.index(hoi["category_id"]),
                )
                counts[triplet] += 1
        self.rare_triplets = [t for t, c in counts.items() if c < 10]
        self.non_rare_triplets = [t for t, c in counts.items() if c >= 10]

    def set_seen_hois(self, zero_shot_setting: str, hoi_list_new_path):
        """unseen -> rare_triplets, seen -> non_rare_triplets (reference's
        reuse of the same fields, datasets/hico.py:213-242)."""
        unseen = UNSEEN_HOI_IDX[zero_shot_setting]
        with open(hoi_list_new_path) as f:
            hoi_list = json.load(f)
        self.rare_triplets = [
            (0, VALID_OBJ_IDS.index(hoi_list[u]["object_cat"]),
             VALID_VERB_IDS.index(hoi_list[u]["verb_id"]))
            for u in unseen
        ]
        self.non_rare_triplets = [
            (0, VALID_OBJ_IDS.index(hoi_list[s]["object_cat"]),
             VALID_VERB_IDS.index(hoi_list[s]["verb_id"]))
            for s in range(600)
            if s not in set(unseen)
        ]

    def load_correct_mat(self, path):
        self.correct_mat = np.load(path)


def build_hico(
    image_set: str,
    hoi_path,
    num_queries: int = 100,
    zero_shot_setting: Optional[str] = None,
    few_shot_transfer: int = 100,
    relation_label_noise: int = 0,
):
    """Annotation-file selection mirroring the reference builder
    (datasets/hico.py:529-623)."""
    root = Path(hoi_path)
    if few_shot_transfer == 100:
        if zero_shot_setting is None:
            if relation_label_noise == 0:
                train_anno = root / "annotations" / "trainval_hico.json"
            else:
                train_anno = (
                    root
                    / "annotations"
                    / f"trainval_hico_{relation_label_noise}relation_noise.json"
                )
        else:
            train_anno = root / "annotations" / f"trainval_hico_{zero_shot_setting}.json"
    elif few_shot_transfer in (1, 10):
        train_anno = root / "annotations" / f"trainval_hico_{few_shot_transfer}percent.json"
    else:
        raise ValueError(few_shot_transfer)

    paths = {
        "train": (root / "images" / "train2015", train_anno),
        "val": (root / "images" / "test2015", root / "annotations" / "test_hico.json"),
    }
    img_folder, anno_file = paths[image_set]
    ds = HICODataset(image_set, img_folder, anno_file, num_queries)
    if image_set == "val":
        if zero_shot_setting is None:
            ds.set_rare_hois(root / "annotations" / "trainval_hico.json")
        else:
            ds.set_seen_hois(zero_shot_setting, root / "annotations" / "hoi_list_new.json")
        ds.load_correct_mat(root / "annotations" / "corre_hico.npy")
    return ds
