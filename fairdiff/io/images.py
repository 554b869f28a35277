"""Image save/load helpers ([-1,1] float NHWC <-> files)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8 [0,255]."""
    return (
        (np.clip(np.asarray(images, np.float32), -1, 1) * 0.5 + 0.5) * 255.0
    ).round().astype(np.uint8)


def save_image(img: np.ndarray, path: str | Path, quality: int = 95) -> None:
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(to_uint8(img)).save(path, quality=quality)


def load_image(path: str | Path) -> np.ndarray:
    """-> float32 [-1,1] HWC (reference read convention,
    eval-generated-images.py:636-637)."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"), np.float32)
    return arr / 127.5 - 1.0
