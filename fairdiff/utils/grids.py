"""Annotated image grids (PIL) — observability parity with the reference's
`plot_in_grid` family (exp-1-debias-gender/1-main-debias.py:140-217,
eval-generated-images.py:65-263):

- images sorted into blocks: no-face first, then per predicted class sorted
  by confidence
- colored border per predicted class (red/blue/green/orange), black for
  no-face
- a confidence bar under each tile and the lane index printed on the tile
- saved as JPEG (the reference uses quality 25 to keep wandb uploads small;
  default higher here, configurable)
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from fairdiff.io.images import to_uint8

CLASS_COLORS = [
    (239, 65, 54),  # red
    (28, 117, 188),  # blue
    (34, 177, 76),  # green
    (255, 127, 39),  # orange
    (163, 73, 164),  # purple
    (255, 201, 14),  # yellow
]


def plot_in_grid(
    images: np.ndarray,  # [N, H, W, 3] in [-1, 1]
    save_to: str | Path,
    *,
    face_indicators: Optional[np.ndarray] = None,
    preds: Optional[np.ndarray] = None,  # [N] int, -1 fill
    probs_max: Optional[np.ndarray] = None,  # [N] confidence of pred
    cols: Optional[int] = None,
    quality: int = 70,
    border: int = 4,
    bar_height: int = 6,
) -> Path:
    from PIL import Image, ImageDraw

    n = len(images)
    face_indicators = (
        np.asarray(face_indicators)
        if face_indicators is not None
        else np.ones(n, bool)
    )
    preds = np.asarray(preds) if preds is not None else np.zeros(n, int)
    probs_max = (
        np.asarray(probs_max) if probs_max is not None else np.ones(n)
    )

    # ordering: no-face block, then per class by ascending confidence
    order = []
    order += [i for i in range(n) if not face_indicators[i]]
    for cls in sorted(set(int(p) for p in preds if p >= 0)):
        members = [i for i in range(n) if face_indicators[i] and preds[i] == cls]
        order += sorted(members, key=lambda i: probs_max[i])

    imgs = to_uint8(np.asarray(images))
    h, w = imgs.shape[1:3]
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    tile_h = h + 2 * border + bar_height
    tile_w = w + 2 * border
    canvas = Image.new("RGB", (cols * tile_w, rows * tile_h), (255, 255, 255))
    draw = ImageDraw.Draw(canvas)

    for slot, idx in enumerate(order):
        r, c = divmod(slot, cols)
        x0, y0 = c * tile_w, r * tile_h
        color = (
            CLASS_COLORS[int(preds[idx]) % len(CLASS_COLORS)]
            if face_indicators[idx] and preds[idx] >= 0
            else (0, 0, 0)
        )
        draw.rectangle([x0, y0, x0 + tile_w - 1, y0 + h + 2 * border - 1], fill=color)
        canvas.paste(Image.fromarray(imgs[idx]), (x0 + border, y0 + border))
        # confidence bar
        bar_y = y0 + h + 2 * border
        draw.rectangle(
            [x0, bar_y, x0 + tile_w - 1, bar_y + bar_height - 1], fill=(230, 230, 230)
        )
        if face_indicators[idx]:
            frac = float(np.clip(probs_max[idx], 0, 1))
            draw.rectangle(
                [x0, bar_y, x0 + int(frac * (tile_w - 1)), bar_y + bar_height - 1],
                fill=color,
            )
        draw.text((x0 + border + 2, y0 + border + 2), str(idx), fill=(255, 255, 255))

    save_to = Path(save_to)
    save_to.parent.mkdir(parents=True, exist_ok=True)
    canvas.save(save_to, quality=quality)
    return save_to


# per-attribute class palettes mirroring the reference's annotation colors
# (eval-generated-images.py:122-263: gender red/blue; race limegreen/black/
# brown/orange; age yellow/purple)
ATTR_PALETTES = {
    "gender": [(239, 65, 54), (28, 117, 188)],
    "race": [(50, 205, 50), (20, 20, 20), (150, 75, 0), (255, 127, 39)],
    "age": [(255, 201, 14), (163, 73, 164)],
}
_NO_FACE = (255, 255, 255)


def plot_in_grid_multi(
    images: np.ndarray,  # [N, H, W, 3] in [-1, 1]
    save_to: str | Path,
    attrs: dict[str, tuple[np.ndarray, np.ndarray]],  # name -> (preds, conf)
    *,
    face_indicators: Optional[np.ndarray] = None,
    face_bboxes: Optional[np.ndarray] = None,  # [N, 4] xyxy, -1 fill
    cols: Optional[int] = None,
    quality: int = 70,
    border: int = 4,
    stripe: int = 10,
    bar_height: int = 5,
) -> Path:
    """Multi-attribute annotated grid (gender x race [x age]) — parity with
    the reference's `plot_in_grid_gender_race[_age]`
    (eval-generated-images.py:65-263): tiles ordered lexicographically by
    joint predicted class (confidence-descending within each cell, no-face
    last), outer border colored by the first attribute, one side stripe per
    further attribute, the face bbox outlined, and one confidence bar per
    attribute."""
    from PIL import Image, ImageDraw

    n = len(images)
    names = list(attrs)
    face_indicators = (
        np.asarray(face_indicators)
        if face_indicators is not None
        else np.ones(n, bool)
    )
    preds = {a: np.asarray(attrs[a][0]) for a in names}
    confs = {a: np.asarray(attrs[a][1]) for a in names}

    def sort_key(i):
        if not face_indicators[i] or any(preds[a][i] < 0 for a in names):
            return (1, 0, 0.0)
        cls = tuple(int(preds[a][i]) for a in names)
        return (0, cls, -float(confs[names[-1]][i]))

    order = sorted(range(n), key=sort_key)

    imgs = to_uint8(np.asarray(images))
    h, w = imgs.shape[1:3]
    n_stripes = len(names) - 1
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    tile_w = w + 2 * border + n_stripes * stripe
    tile_h = h + 2 * border + len(names) * bar_height
    canvas = Image.new("RGB", (cols * tile_w, rows * tile_h), (255, 255, 255))
    draw = ImageDraw.Draw(canvas)

    def color(a, i):
        p = int(preds[a][i])
        if not face_indicators[i] or p < 0:
            return _NO_FACE
        pal = ATTR_PALETTES.get(a, CLASS_COLORS)
        return pal[p % len(pal)]

    for slot, idx in enumerate(order):
        r, c = divmod(slot, cols)
        x0, y0 = c * tile_w, r * tile_h
        # stripes for attributes 2..k on the left (reference's side expand)
        for s, a in enumerate(names[1:]):
            sx = x0 + s * stripe
            draw.rectangle(
                [sx, y0, sx + stripe - 1, y0 + h + 2 * border - 1],
                fill=color(a, idx),
            )
        # outer border colored by the first attribute
        bx = x0 + n_stripes * stripe
        draw.rectangle(
            [bx, y0, bx + w + 2 * border - 1, y0 + h + 2 * border - 1],
            fill=color(names[0], idx),
        )
        tile = Image.fromarray(imgs[idx].copy())
        if face_bboxes is not None and face_indicators[idx]:
            bb = np.asarray(face_bboxes[idx]).tolist()
            if bb[2] > bb[0]:
                ImageDraw.Draw(tile).rectangle(bb, outline=(0, 0, 0), width=3)
        canvas.paste(tile, (bx + border, y0 + border))
        draw.text((bx + border + 2, y0 + border + 2), str(idx), fill=(255, 255, 255))
        # one confidence bar per attribute
        for s, a in enumerate(names):
            bar_y = y0 + h + 2 * border + s * bar_height
            draw.rectangle(
                [x0, bar_y, x0 + tile_w - 1, bar_y + bar_height - 1],
                fill=(235, 235, 235),
            )
            if face_indicators[idx] and preds[a][idx] >= 0:
                frac = float(np.clip(confs[a][idx], 0, 1))
                draw.rectangle(
                    [x0, bar_y, x0 + int(frac * (tile_w - 1)), bar_y + bar_height - 1],
                    fill=color(a, idx),
                )

    save_to = Path(save_to)
    save_to.parent.mkdir(parents=True, exist_ok=True)
    canvas.save(save_to, quality=quality)
    return save_to
