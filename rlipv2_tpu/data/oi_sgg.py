"""Open Images v6 SGG dataset in HICO format
(reference: datasets/oi_sgg.py:32-412): 288 object classes / 30 relation
classes, 'rel_annotations' key, object ids remapped through the categories
dict asset (OI_SGG_trainval_test_categories_dict.json + the all-objects
categories_dict.json)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

from rlipv2_tpu.data.hico import HICODataset
from rlipv2_tpu.data.transforms import HOITransform


class OISGGDataset(HICODataset):
    rel_key = "rel_annotations"
    num_verb_classes = 30

    def __init__(
        self,
        image_set: str,
        img_folder,
        anno_file,
        categories_dict_file,
        categories_dict_all_objs_file=None,
        num_queries: int = 100,
        transforms: Optional[HOITransform] = None,
    ):
        cats = json.loads(Path(categories_dict_file).read_text())
        self._object_text = cats["obj"]
        self._verb_text = cats["rel"]
        if categories_dict_all_objs_file is not None:
            all_objs = json.loads(Path(categories_dict_all_objs_file).read_text())[
                "obj"
            ]
            self._valid_obj_ids = [all_objs.index(o) for o in self._object_text]
        else:
            self._valid_obj_ids = list(range(len(self._object_text)))

        super().__init__(image_set, img_folder, anno_file, num_queries, transforms)
        self.object_text = list(self._object_text)
        self.verb_text = list(self._verb_text)

    def _obj_index(self, category_id: int) -> int:
        return self._valid_obj_ids.index(category_id)

    def _verb_index(self, category_id: int) -> int:
        return int(category_id)  # OI relations are already 0-based


def build_oi_sgg(image_set: str, sgg_path, num_queries: int = 100):
    root = Path(sgg_path)
    paths = {
        "train": (root / "images", root / "annotations" / "oi_sgg_train.json"),
        "val": (root / "images", root / "annotations" / "oi_sgg_test.json"),
    }
    img_folder, anno_file = paths[image_set]
    return OISGGDataset(
        image_set,
        img_folder,
        anno_file,
        root / "annotations" / "OI_SGG_trainval_test_categories_dict.json",
        root / "annotations" / "categories_dict.json",
        num_queries,
    )
