"""Image preprocessing (host numpy + jittable JAX variants).

Replaces the reference's torchvision/PIL native resize pipeline
(image_processing_vlm.py:127-162 resize + expand2square; funcs.py:523-528
bilinear resize; data_hico.py:320). PlanGen's image-processor hack
(plangen_base.py:136-147) feeds the SAME [-1,1] tensor to both SigLIP and the
VQ encoder, so one normalized image serves both paths.

`jax.image.resize` runs on-device and fuses under jit (throughput mode);
eval-parity mode can pre-resize on host with PIL if bit-parity with the
reference's PIL bicubic is required (documented tradeoff, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def resize_image(
    image: jax.Array, size: Tuple[int, int], method: str = "bilinear"
) -> jax.Array:
    """Resize [H, W, 3] or [B, H, W, 3] to `size` (jit-compatible)."""
    if image.ndim == 3:
        return jax.image.resize(image, (*size, image.shape[-1]), method=method)
    b = image.shape[0]
    return jax.image.resize(image, (b, *size, image.shape[-1]), method=method)


def to_model_range(image_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1, 1] (Normalize(0.5, 0.5) semantics)."""
    return image_u8.astype(np.float32) / 127.5 - 1.0


def from_model_range(image: np.ndarray) -> np.ndarray:
    """float [-1, 1] -> uint8 [0, 255] (reference denorm_pt, funcs.py:511-515)."""
    x = np.clip((np.asarray(image, dtype=np.float32) + 1.0) * 127.5, 0, 255)
    return x.astype(np.uint8)


def clip_normalize(image_u8: np.ndarray) -> np.ndarray:
    """uint8 -> CLIP-normalized float32 (VLMImageProcessor default path,
    image_processing_vlm.py:35-36,163-196). Used only when running the vanilla
    Janus processor path without PlanGen's tensor-passthrough hack."""
    x = image_u8.astype(np.float32) / 255.0
    return (x - CLIP_MEAN) / CLIP_STD


def janus_image_preprocess(image_u8: np.ndarray, image_size: int = 384) -> np.ndarray:
    """Vanilla Janus VLMImageProcessor path (no PlanGen tensor hack):
    long-side bicubic+antialias resize, expand2square pad with the CLIP mean
    color, then CLIP normalize. Reference: image_processing_vlm.py:41-52,
    127-162. Used for eval parity against standalone Janus inference.
    """
    from PIL import Image

    pil = Image.fromarray(image_u8)
    w, h = pil.size
    scale = image_size / max(w, h)
    new_w = max(int(w * scale), 1)
    new_h = max(int(h * scale), 1)
    pil = pil.resize((new_w, new_h), Image.BICUBIC)
    bg = tuple(int(255 * m) for m in CLIP_MEAN)
    canvas = Image.new("RGB", (image_size, image_size), bg)
    canvas.paste(pil, ((image_size - new_w) // 2, (image_size - new_h) // 2))
    return clip_normalize(np.asarray(canvas))


def build_edit_region(
    edit_boxes: np.ndarray,  # [N, 4] normalized x1,y1,x2,y2
    grid: int = 24,
    pad_edit_box: float = 0.0,
) -> np.ndarray:
    """Rasterize edit boxes onto the token grid -> [grid*grid] int64 {0,1}.

    1 = regenerate. Boxes are optionally dilated by `pad_edit_box` fraction of
    their size then clamped to [0,1]; cells are marked via integer truncation
    of grid*coord, matching reference data_hico.py:330-344.
    """
    region = np.zeros((grid, grid), dtype=np.int64)
    boxes = np.asarray(edit_boxes, dtype=np.float32).reshape(-1, 4).copy()
    if pad_edit_box != 0 and len(boxes):
        dx = boxes[:, 2] - boxes[:, 0]
        dy = boxes[:, 3] - boxes[:, 1]
        boxes[:, 0] -= dx * pad_edit_box
        boxes[:, 1] -= dy * pad_edit_box
        boxes[:, 2] += dx * pad_edit_box
        boxes[:, 3] += dy * pad_edit_box
    # always clamp: a slightly-negative raw detector coordinate would
    # otherwise produce an empty (or wrap-around) grid slice below
    boxes = boxes.clip(0, 1)
    for box in boxes:
        x1, y1, x2, y2 = (int(grid * v) for v in box)
        region[y1:y2, x1:x2] = 1
    return region.reshape(-1)
