"""V-COCO dataset in HOIA format (reference: datasets/vcoco.py:20-207).

Structurally the HICO pipeline with 29 action classes and V-COCO's label
texts; GT hois may reference object_id -1 (subject-only actions), which the
dataset keeps for the evaluator and skips for training pairs exactly like
the reference (no-object pairs become all-zero object boxes).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from rlipv2_tpu.data.hico import HICODataset
from rlipv2_tpu.data.transforms import HOITransform
from rlipv2_tpu.data.vocab import HICO_OBJECT_NAMES, VCOCO_VERB_NAMES, VALID_OBJ_IDS


class VCOCODataset(HICODataset):
    allow_no_object_pairs = True
    num_verb_classes = 29

    def __init__(
        self,
        image_set: str,
        img_folder,
        anno_file,
        num_queries: int = 100,
        transforms: Optional[HOITransform] = None,
        names_file=None,
    ):
        super().__init__(image_set, img_folder, anno_file, num_queries, transforms)
        if names_file is not None:
            names = json.loads(Path(names_file).read_text())
            self.object_text = names["object_names"]
            self.verb_text = names["verb_names"]
        else:
            self.object_text = list(HICO_OBJECT_NAMES)
            self.verb_text = list(VCOCO_VERB_NAMES)
        self.valid_verb_ids = list(range(29))

    # V-COCO annotations use 0-based verb ids already; HICODataset's
    # VALID_VERB_IDS.index(1-based) remap must be bypassed.
    def _verb_index(self, category_id: int) -> int:
        return int(category_id)


def build_vcoco(image_set: str, hoi_path, num_queries: int = 100, names_file=None):
    root = Path(hoi_path)
    paths = {
        "train": (root / "images" / "train2014", root / "annotations" / "trainval_vcoco.json"),
        "val": (root / "images" / "val2014", root / "annotations" / "test_vcoco.json"),
    }
    img_folder, anno_file = paths[image_set]
    ds = VCOCODataset(image_set, img_folder, anno_file, num_queries, names_file=names_file)
    if image_set == "val":
        mat = root / "annotations" / "corre_vcoco.npy"
        if mat.exists():
            ds.load_correct_mat(mat)
    return ds
