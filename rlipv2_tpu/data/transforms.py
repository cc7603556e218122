"""Image + box augmentations (host-side numpy/PIL).

Capability parity with the reference's datasets/transforms.py pipeline as
configured by make_hico_transforms (reference: datasets/hico.py:471-501):
  * RandomHorizontalFlip (boxes flipped);
  * ColorJitter(0.4, 0.4, 0.4) brightness/contrast/saturation;
  * RandomSelect(multi-scale RandomResize(480..800, max 1333) |
    RandomResize(400/500/600) + RandomSizeCrop(384, 600) + multi-scale);
  * val: RandomResize([800], max 1333);
  * Normalize (ImageNet mean/std) + boxes -> normalized cxcywh.

Boxes are xyxy float pixel coords until `normalize_target`. Targets carry
parallel arrays and an index column so crops can drop boxes consistently
(the reference tracks this with a (i, class) label pair,
datasets/hico.py:100-135).

TPU note: the OUTPUT contract is static — callers bucket the resulting
image to fixed shapes in collate.py; augmentation itself stays dynamic on
host where raggedness is free.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

TRAIN_SCALES = [480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800]


def _pil():
    from PIL import Image

    return Image


def resize_image(img: np.ndarray, size: int, max_size: Optional[int] = 1333):
    """Resize so the shorter side == size, longer side <= max_size.
    img: (H, W, 3) uint8. Returns resized uint8 + (sh, sw) scale factors."""
    h, w = img.shape[:2]
    short, long = min(h, w), max(h, w)
    scale = size / short
    if max_size is not None and long * scale > max_size:
        scale = max_size / long
    nh, nw = int(round(h * scale)), int(round(w * scale))
    Image = _pil()
    out = np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR)
    )
    return out, (nh / h, nw / w)


class HOITransform:
    """Composable train/val pipeline. target dict fields:
    boxes (n,4) xyxy px, labels (n,), plus HOI fields passed through;
    boxes are transformed in place; `keep` masks propagate to labels and
    box_indices."""

    def __init__(self, train: bool, scales=None, max_size: int = 1333, rng=None,
                 val_size: int = 800):
        self.train = train
        self.scales = scales or TRAIN_SCALES
        self.max_size = max_size
        self.val_size = val_size
        self.rng = rng or random.Random()

    # -------------------------- primitives ---------------------------- #

    def hflip(self, img, target):
        img = img[:, ::-1].copy()
        w = img.shape[1]
        if len(target["boxes"]):
            b = target["boxes"]
            target["boxes"] = np.stack(
                [w - b[:, 2], b[:, 1], w - b[:, 0], b[:, 3]], axis=1
            )
        return img, target

    def color_jitter(self, img, strength=0.4):
        x = img.astype(np.float32)
        # brightness
        x = x * self.rng.uniform(1 - strength, 1 + strength)
        # contrast
        mean = x.mean()
        x = (x - mean) * self.rng.uniform(1 - strength, 1 + strength) + mean
        # saturation
        gray = x.mean(axis=2, keepdims=True)
        x = (x - gray) * self.rng.uniform(1 - strength, 1 + strength) + gray
        return np.clip(x, 0, 255).astype(np.uint8)

    def random_resize(self, img, target, sizes):
        size = self.rng.choice(sizes)
        img, (sh, sw) = resize_image(img, size, self.max_size)
        if len(target["boxes"]):
            target["boxes"] = target["boxes"] * np.array([sw, sh, sw, sh], np.float32)
        return img, target

    def random_size_crop(self, img, target, min_size=384, max_crop=600):
        h, w = img.shape[:2]
        cw = self.rng.randint(min_size, min(w, max_crop)) if w > min_size else w
        ch = self.rng.randint(min_size, min(h, max_crop)) if h > min_size else h
        x0 = self.rng.randint(0, max(w - cw, 0)) if w > cw else 0
        y0 = self.rng.randint(0, max(h - ch, 0)) if h > ch else 0
        img = img[y0 : y0 + ch, x0 : x0 + cw]
        if len(target["boxes"]):
            b = target["boxes"] - np.array([x0, y0, x0, y0], np.float32)
            b[:, 0::2] = b[:, 0::2].clip(0, cw)
            b[:, 1::2] = b[:, 1::2].clip(0, ch)
            keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
            target["boxes"] = b[keep]
            target["labels"] = target["labels"][keep]
            if "box_indices" in target:
                target["box_indices"] = target["box_indices"][keep]
        return img, target

    # --------------------------- pipeline ----------------------------- #

    def __call__(self, img: np.ndarray, target: dict):
        """img uint8 (H, W, 3); returns normalized float32 image + target
        with boxes STILL xyxy in pixels of the output image."""
        if self.train:
            if self.rng.random() < 0.5:
                img, target = self.hflip(img, target)
            img = self.color_jitter(img)
            if self.rng.random() < 0.5:
                img, target = self.random_resize(img, target, self.scales)
            else:
                img, target = self.random_resize(img, target, [400, 500, 600])
                img, target = self.random_size_crop(img, target)
                img, target = self.random_resize(img, target, self.scales)
        else:
            img, target = self.random_resize(img, target, [self.val_size])

        img = img.astype(np.float32) / 255.0
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        return img, target


def normalize_boxes(boxes_xyxy: np.ndarray, h: int, w: int) -> np.ndarray:
    """xyxy px -> normalized cxcywh (reference: datasets/transforms.py
    Normalize)."""
    if len(boxes_xyxy) == 0:
        return boxes_xyxy.reshape(0, 4)
    b = boxes_xyxy.astype(np.float32)
    cx = (b[:, 0] + b[:, 2]) / 2 / w
    cy = (b[:, 1] + b[:, 3]) / 2 / h
    bw = (b[:, 2] - b[:, 0]) / w
    bh = (b[:, 3] - b[:, 1]) / h
    return np.stack([cx, cy, bw, bh], axis=1)
