"""Layout visualization (PIL): box overlays + image grids.

Equivalent of the reference's `bbox_visualization`/`draw_boxes_on_image`/
`save_img` utilities (src/utils/funcs.py:86-160, 643-756) without cv2:
deterministic per-index colors, label text, horizontal grid saver.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_COLORS = [
    (230, 60, 60),
    (60, 140, 230),
    (70, 190, 80),
    (240, 170, 40),
    (170, 80, 220),
    (30, 200, 200),
    (240, 110, 180),
    (150, 150, 60),
    (100, 100, 240),
    (200, 120, 80),
]


def to_uint8(image):
    """Float [-1, 1] -> uint8 pixels (identity on uint8 input) — the ONE
    pixel-contract conversion shared by eval artifacts, grids, and serving
    PNGs (serve.py imports it), so the contract cannot silently fork."""
    import numpy as np

    if image.dtype != np.uint8:
        image = np.clip((image + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return image


def draw_layout(
    image: np.ndarray,  # [H, W, 3] uint8 or float [-1, 1]
    boxes: Sequence[Sequence[float]],  # normalized xyxy
    labels: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """Return a copy with box overlays + labels (uint8)."""
    from PIL import Image, ImageDraw

    image = to_uint8(image)
    pil = Image.fromarray(image)
    draw = ImageDraw.Draw(pil)
    h, w = image.shape[:2]
    for i, box in enumerate(boxes):
        x1, y1, x2, y2 = (
            box[0] * w,
            box[1] * h,
            box[2] * w,
            box[3] * h,
        )
        color = _COLORS[i % len(_COLORS)]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        if labels is not None and i < len(labels) and labels[i]:
            text = labels[i][:40]
            ty = max(0, y1 - 12)
            draw.rectangle([x1, ty, x1 + 6 * len(text), ty + 12], fill=color)
            draw.text((x1 + 1, ty), text, fill=(255, 255, 255))
    return np.asarray(pil)


def save_image(image: np.ndarray, path: str) -> None:
    from PIL import Image

    image = to_uint8(image)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(image).save(path)


def save_image_grid(
    images: Sequence[np.ndarray], path: str, cols: Optional[int] = None
) -> None:
    """Tile images row-major and save (reference save_img, funcs.py:150-160)."""
    from PIL import Image

    imgs = [to_uint8(im) for im in images]
    n = len(imgs)
    cols = cols or n
    rows = -(-n // cols)
    h, w = imgs[0].shape[:2]
    grid = np.full((rows * h, cols * w, 3), 255, dtype=np.uint8)
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
