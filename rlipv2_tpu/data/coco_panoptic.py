"""Panoptic COCO dataset reader — the data side of the DETR-legacy
segmentation path (mask heads models/segmentation.py + PQ evaluator
eval/panoptic_eval.py).

Capability parity with the reference `datasets/coco_panoptic.py:26-86`
(`CocoPanoptic`): panoptic json parsed directly (images sorted by id and
aligned with annotations), per-segment masks decoded from the RGB id PNG
(`rgb2id`), labels from `category_id`, boxes derived from masks
(`masks_to_boxes`, reference util/box_ops.py:76-92), iscrowd/area carried
through. No panopticapi / pycocotools dependency — `rgb2id` is
implemented here.

TPU-first notes: masks stay uint8 numpy on the host; the eval-style
resize (shorter side -> `val_size`, cap `max_size`) interpolates the
image bilinearly and the id-map with NEAREST before splitting into
per-segment masks, so segment identity survives the resize exactly. The
reader emits the repo's standard dataset contract (image HWC float32 or
uint8, target dict) so the bucketed collate + prefetch loader
(data/loader.py) drive it unchanged.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


def rgb2id(color: np.ndarray) -> np.ndarray:
    """Panoptic COCO RGB PNG -> int32 segment-id map
    (panopticapi.utils.rgb2id: id = R + 256*G + 256^2*B)."""
    color = np.asarray(color, dtype=np.uint32)
    return (
        color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]
    ).astype(np.int64)


def masks_to_boxes(masks: np.ndarray) -> np.ndarray:
    """(N, H, W) binary masks -> (N, 4) xyxy boxes (pixel units); empty
    masks give zero boxes (reference util/box_ops.py:76-92)."""
    n, h, w = masks.shape
    boxes = np.zeros((n, 4), np.float32)
    ys, xs = np.arange(h), np.arange(w)
    for i in range(n):
        m = masks[i] > 0
        if not m.any():
            continue
        col = m.any(axis=0)
        row = m.any(axis=1)
        x0, x1 = xs[col][0], xs[col][-1]
        y0, y1 = ys[row][0], ys[row][-1]
        boxes[i] = (x0, y0, x1 + 1, y1 + 1)
    return boxes


class CocoPanopticDataset:
    """Reader for the COCO panoptic layout: an images folder, a folder of
    RGB-id PNGs, and the panoptic json."""

    def __init__(
        self,
        img_folder,
        ann_folder,
        ann_file,
        val_size: Optional[int] = None,
        max_size: int = 1333,
        return_masks: bool = True,
        normalize: bool = True,
    ):
        with open(ann_file) as f:
            self.coco = json.load(f)
        # alphabetical == id order alignment of images and annotations
        # (reference coco_panoptic.py:31-36)
        self.coco["images"] = sorted(self.coco["images"], key=lambda x: x["id"])
        if "annotations" in self.coco:
            for img, ann in zip(self.coco["images"], self.coco["annotations"]):
                assert img["file_name"][:-4] == ann["file_name"][:-4], (
                    img["file_name"], ann["file_name"],
                )
        self.img_folder = Path(img_folder)
        self.ann_folder = Path(ann_folder)
        self.val_size = val_size
        self.max_size = max_size
        self.return_masks = return_masks
        self.normalize = normalize

    def __len__(self):
        return len(self.coco["images"])

    def get_height_and_width(self, idx: int):
        info = self.coco["images"][idx]
        return info["height"], info["width"]

    def _resized_hw(self, h: int, w: int):
        if self.val_size is None:
            return h, w
        short, long = min(h, w), max(h, w)
        scale = self.val_size / short
        if long * scale > self.max_size:
            scale = self.max_size / long
        return max(1, round(h * scale)), max(1, round(w * scale))

    def __getitem__(self, idx: int):
        from PIL import Image

        has_ann = "annotations" in self.coco
        ann_info = (
            self.coco["annotations"][idx] if has_ann
            else self.coco["images"][idx]
        )
        img_path = self.img_folder / ann_info["file_name"].replace(
            ".png", ".jpg"
        )
        img = Image.open(img_path).convert("RGB")
        w, h = img.size
        rh, rw = self._resized_hw(h, w)
        if (rh, rw) != (h, w):
            img = img.resize((rw, rh), Image.BILINEAR)

        target = {
            "image_id": int(
                ann_info.get("image_id", ann_info.get("id", idx))
            ),
            "orig_size": np.asarray([h, w], np.int64),
            "size": np.asarray([rh, rw], np.int64),
        }

        if has_ann and "segments_info" in ann_info:
            ann_path = self.ann_folder / ann_info["file_name"]
            id_png = Image.open(ann_path)
            if (rh, rw) != (h, w):
                # NEAREST keeps segment ids exact through the resize
                id_png = id_png.resize((rw, rh), Image.NEAREST)
            id_map = rgb2id(np.asarray(id_png, np.uint8))
            infos = ann_info["segments_info"]
            ids = np.asarray([s["id"] for s in infos], np.int64)
            masks = (id_map[None] == ids[:, None, None]).astype(np.uint8)
            target["labels"] = np.asarray(
                [s["category_id"] for s in infos], np.int64
            )
            if self.return_masks:
                target["masks"] = masks
            target["boxes"] = masks_to_boxes(masks)
            target["iscrowd"] = np.asarray(
                [s.get("iscrowd", 0) for s in infos], np.int64
            )
            target["area"] = np.asarray(
                [s.get("area", int(m.sum())) for s, m in zip(infos, masks)],
                np.int64,
            )

        arr = np.asarray(img)
        if self.normalize:
            arr = arr.astype(np.float32) / 255.0
        return arr, target
