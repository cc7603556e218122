"""Image + box augmentations (host-side PIL/numpy).

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

TPU + host-throughput notes: the OUTPUT contract is static — callers
bucket the resulting image to fixed shapes in collate.py; augmentation
itself stays dynamic on host where raggedness is free. The pipeline runs
on PIL images internally (flip/jitter/resize/crop are all SIMD C loops)
and converts to numpy ONCE at the end; with normalize=False the image
stays uint8 end-to-end and the models normalize on device (see
models/layers.normalize_pixels), which cuts the host float passes and
shrinks the host->device transfer 4x.
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


def _to_pil(img):
    """numpy (H, W, 3) uint8 or PIL.Image -> PIL.Image."""
    if isinstance(img, np.ndarray):
        return _pil().fromarray(img)
    return img


def _size_hw(img) -> tuple[int, int]:
    if isinstance(img, np.ndarray):
        return img.shape[0], img.shape[1]
    w, h = img.size
    return h, w


def resize_image(img, size: int, max_size: Optional[int] = 1333):
    """Resize so the shorter side == size, longer side <= max_size.
    img: (H, W, 3) uint8 array or PIL.Image. Returns a PIL.Image +
    (sh, sw) scale factors."""
    h, w = _size_hw(img)
    short, long = min(h, w), max(h, w)
    scale = size / short
    if max_size is not None and long * scale > max_size:
        scale = max_size / long
    nh, nw = int(round(h * scale)), int(round(w * scale))
    Image = _pil()
    out = _to_pil(img).resize((nw, nh), Image.BILINEAR)
    return out, (nh / h, nw / w)


class HOITransform:
    """Composable train/val pipeline. target dict fields:
    boxes (n,4) xyxy px, labels (n,), plus HOI fields passed through;
    boxes are transformed in place; `keep` masks propagate to labels and
    box_indices."""

    def __init__(self, train: bool, scales=None, max_size: int = 1333, rng=None,
                 val_size: int = 800, normalize: bool = True):
        self.train = train
        self.scales = scales or TRAIN_SCALES
        self.max_size = max_size
        self.val_size = val_size
        self.rng = rng or random.Random()
        # normalize=False keeps the image uint8 end-to-end: the models
        # normalize on device (fused into the stem conv by XLA), the host
        # skips ~3 full-image float passes, and the host->device transfer
        # shrinks 4x. Models key on the input dtype, so both paths coexist.
        self.normalize = normalize

    # -------------------------- primitives ---------------------------- #

    def hflip(self, img, target):
        Image = _pil()
        pil = _to_pil(img)
        img = pil.transpose(Image.FLIP_LEFT_RIGHT)
        w = pil.size[0]
        if len(target["boxes"]):
            b = target["boxes"]
            target["boxes"] = np.stack(
                [w - b[:, 2], b[:, 1], w - b[:, 0], b[:, 3]], axis=1
            )
        return img, target

    def color_jitter(self, img, strength=0.4):
        """Brightness/contrast/saturation jitter, matching torchvision
        ColorJitter(.4,.4,.4) semantics (reference: datasets/hico.py's
        make_hico_transforms): brightness = blend with black, contrast =
        blend with the mean of the LUMA-grayscale image, saturation =
        blend with the grayscale image. PIL's ImageEnhance implements
        exactly these blends in SIMD C; the numpy fallback composes the
        same three blends into one affine pass."""
        b = self.rng.uniform(1 - strength, 1 + strength)
        c = self.rng.uniform(1 - strength, 1 + strength)
        s = self.rng.uniform(1 - strength, 1 + strength)
        try:
            from PIL import ImageEnhance

            im = _to_pil(img)
            im = ImageEnhance.Brightness(im).enhance(b)
            im = ImageEnhance.Contrast(im).enhance(c)
            im = ImageEnhance.Color(im).enhance(s)
            return im
        except ImportError:
            # single-affine composition of the three sequential blends:
            # x3 = (s*c*b)*x + ((1-s)*c*b)*gray0 + ((1-c)*b)*mean0
            x = np.asarray(img).astype(np.float32)
            gray0 = x @ np.array([0.299, 0.587, 0.114], np.float32)
            mean0 = gray0.mean()
            out = x * (s * c * b)
            out += (gray0 * ((1 - s) * c * b) + (1 - c) * b * mean0)[:, :, None]
            np.clip(out, 0, 255, out=out)
            return out.astype(np.uint8)

    def random_resize(self, img, target, sizes):
        size = self.rng.choice(sizes)
        img, (sh, sw) = resize_image(img, size, self.max_size)
        if len(target["boxes"]):
            target["boxes"] = target["boxes"] * np.array([sw, sh, sw, sh], np.float32)
        return img, target

    def random_size_crop(self, img, target, min_size=384, max_crop=600):
        h, w = _size_hw(img)
        cw = self.rng.randint(min_size, min(w, max_crop)) if w > min_size else w
        ch = self.rng.randint(min_size, min(h, max_crop)) if h > min_size else h
        x0 = self.rng.randint(0, max(w - cw, 0)) if w > cw else 0
        y0 = self.rng.randint(0, max(h - ch, 0)) if h > ch else 0
        if isinstance(img, np.ndarray):
            img = img[y0 : y0 + ch, x0 : x0 + cw]
        else:
            img = img.crop((x0, y0, x0 + cw, y0 + ch))
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

    def __call__(self, img, target: dict):
        """img uint8 (H, W, 3) array or PIL.Image; returns a float32
        normalized (normalize=True) or uint8 (normalize=False) numpy image
        + target with boxes STILL xyxy in pixels of the output image."""
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

        img = np.asarray(img)
        if self.normalize:
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
