"""Box-aware image transforms (host numpy + PIL).

Behavioral re-implementations of the reference's shared dataset helpers:
  * short-side resize + center crop with box adjustment
    (dataset/coco/data_coco.py:24-71 resize_and_crop)
  * 384-canvas box filtering: clip to the canvas, drop boxes with
    area < 200 px^2 or origin beyond 380 (data_coco.py:74-106 filter_box)
  * random mirror / IoU-constrained sample crop for training augmentation
    (code_hico/dataset/augmentations.py SSD-style transforms)
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def resize_short_side_center_crop(
    image: np.ndarray,  # [H, W, 3] float or uint8
    boxes_xywh: np.ndarray,  # [N, 4] pixel coords (x1, y1, w, h)
    target: int = 384,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bilinear short-side resize to `target`, center crop, adjust boxes."""
    from PIL import Image

    h, w = image.shape[:2]
    if w < h:
        scale = target / w
        new_w, new_h = target, int(h * scale)
    else:
        scale = target / h
        new_h, new_w = target, int(w * scale)
    pil = Image.fromarray(
        image.astype(np.uint8) if image.dtype != np.uint8 else image
    ).resize((new_w, new_h), Image.BILINEAR)
    left = (new_w - target) // 2
    top = (new_h - target) // 2
    pil = pil.crop((left, top, left + target, top + target))
    out = np.asarray(pil)

    boxes = np.asarray(boxes_xywh, dtype=np.float32).reshape(-1, 4).copy()
    boxes[:, 0] = boxes[:, 0] * scale - left
    boxes[:, 1] = boxes[:, 1] * scale - top
    boxes[:, 2] *= scale
    boxes[:, 3] *= scale
    return out, boxes


def filter_boxes_canvas(
    boxes_xywh: np.ndarray,
    classes: Sequence[str],
    canvas: int = 384,
    min_area: float = 200.0,
    max_origin: float = 380.0,
) -> Tuple[np.ndarray, List[str]]:
    """Clip boxes to the canvas; drop tiny or out-of-frame boxes."""
    kept_boxes: List[List[float]] = []
    kept_classes: List[str] = []
    for i, (x, y, w, h) in enumerate(np.asarray(boxes_xywh).reshape(-1, 4)):
        x2, y2 = x + w, y + h
        x, y = max(0.0, x), max(0.0, y)
        if x > max_origin or y > max_origin:
            continue
        x2, y2 = min(float(canvas), x2), min(float(canvas), y2)
        w, h = x2 - x, y2 - y
        if w * h < min_area:
            continue
        kept_boxes.append([x, y, w, h])
        kept_classes.append(classes[i])
    return np.asarray(kept_boxes, dtype=np.float32).reshape(-1, 4), kept_classes


def xywh_to_xyxy_norm(boxes_xywh: np.ndarray, scale: float) -> np.ndarray:
    b = np.asarray(boxes_xywh, dtype=np.float32).reshape(-1, 4) / scale
    out = b.copy()
    out[:, 2] = b[:, 0] + b[:, 2]
    out[:, 3] = b[:, 1] + b[:, 3]
    return out


def pad_layout_slots(
    boxes_xyxy: np.ndarray,
    classes: Sequence[str],
    slots: int = 10,
) -> Tuple[np.ndarray, List[str], np.ndarray]:
    """Truncate/pad to the 10-slot canonical layout with a validity mask
    (reference convert_*_to_hico, data_hico.py:185-267)."""
    boxes = np.asarray(boxes_xyxy, dtype=np.float32).reshape(-1, 4)[:slots]
    classes = list(classes)[:slots]
    n = len(boxes)
    pad = slots - n
    boxes = np.concatenate([boxes, np.zeros((pad, 4), dtype=np.float32)], axis=0)
    classes = classes + [""] * pad
    valid = np.array([1] * n + [0] * pad, dtype=np.int32)
    # invalidate zero boxes / empty classes (data_hico.py:314-318)
    for i in range(slots):
        if boxes[i].sum() == 0 or classes[i] == "":
            valid[i] = 0
    return boxes, classes, valid


def random_mirror(
    image: np.ndarray, boxes_xyxy_norm: np.ndarray, rng: np.random.RandomState
) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip with box reflection (augmentations.py RandomMirror)."""
    if rng.rand() < 0.5:
        image = image[:, ::-1].copy()
        b = boxes_xyxy_norm.copy()
        b[:, 0], b[:, 2] = 1.0 - boxes_xyxy_norm[:, 2], 1.0 - boxes_xyxy_norm[:, 0]
        return image, b
    return image, boxes_xyxy_norm
