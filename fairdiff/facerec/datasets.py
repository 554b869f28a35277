"""Face-recognition datasets + verification metrics (opensphere parity).

Ports the data layer of the vendored opensphere subproject (SURVEY.md
§2.2): ClassDataset (annotation-file classification training with optional
label-noise corruption, opensphere/dataset/class_dataset.py:9-76),
PairDataset (verification pairs with ACC/EER/AUC/TPR@FPR evaluation,
pair_dataset.py:69-), ItemDataset, and the image pipeline
(dataset/utils.py:13-37). Host-side numpy/cv2 — this is the input pipeline,
not the differentiable path.
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from fairdiff.guidance.geometry import estimate_similarity


def image_pipeline(
    info: dict,
    test_mode: bool,
    rng: Optional[random.Random] = None,
) -> np.ndarray:
    """Read -> BGR->RGB -> optional 5-pt similarity alignment -> [-1,1]
    HWC float32 -> random horizontal flip in train mode
    (opensphere/dataset/utils.py:13-37; NHWC here, not CHW)."""
    import cv2

    image = cv2.imread(str(info["path"]))
    if image is None:
        raise OSError(f"{info['path']} is not found")
    image = np.asarray(image)[:, :, ::-1]

    src = info.get("src_landmark")
    tgz = info.get("tgz_landmark")
    crop_size = info.get("crop_size")
    if not (src is None or tgz is None or crop_size is None):
        m = np.asarray(estimate_similarity(np.asarray(tgz), np.asarray(src)))
        image = cv2.warpAffine(image.astype(np.float32), m, tuple(crop_size),
                               borderValue=0.0)

    image = (image - 127.5) / 127.5
    image = image.astype(np.float32)
    rng = rng or random
    if not test_mode and rng.random() > 0.5:
        image = image[:, ::-1, :].copy()
    return image


@dataclasses.dataclass
class ClassDataset:
    """name \t path \t label annotation file; optional label corruption
    (class_dataset.py label-noise option)."""

    data_dir: str
    ann_path: str
    test_mode: bool = False
    noise_ratio: float = 0.0
    noise_seed: int = 0

    def __post_init__(self):
        items = []
        with open(self.ann_path) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) < 2:
                    continue
                path, label = parts[0], int(parts[-1])
                items.append((str(Path(self.data_dir) / path), label))
        self.items = items
        self.num_classes = max(l for _, l in items) + 1 if items else 0
        self.labels = np.asarray([l for _, l in items])
        if self.noise_ratio > 0:
            rng = np.random.default_rng(self.noise_seed)
            n_corrupt = int(len(items) * self.noise_ratio)
            idx = rng.choice(len(items), n_corrupt, replace=False)
            self.labels = self.labels.copy()
            self.labels[idx] = rng.integers(0, self.num_classes, n_corrupt)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        img = image_pipeline({"path": self.items[i][0]}, self.test_mode)
        return img, int(self.labels[i])

    def batches(self, batch_size: int, seed: int = 0, drop_last: bool = True):
        """Restartable shuffled batch iterator (IterLoader semantics,
        opensphere/utils.py:55-79)."""
        rng = np.random.default_rng(seed)
        while True:
            order = rng.permutation(len(self))
            for s in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
                idx = order[s : s + batch_size]
                imgs, labels = zip(*(self[i] for i in idx))
                yield np.stack(imgs), np.asarray(labels)


@dataclasses.dataclass
class PairDataset:
    """Verification pairs: lines `path1 path2 label`."""

    data_dir: str
    ann_path: str
    metrics_fprs: Sequence[float] = (1e-4, 1e-3)

    def __post_init__(self):
        self.pairs = []
        with open(self.ann_path) as f:
            for line in f:
                p1, p2, label = line.strip().split()[:3]
                self.pairs.append(
                    (
                        str(Path(self.data_dir) / p1),
                        str(Path(self.data_dir) / p2),
                        int(label),
                    )
                )

    def __len__(self):
        return len(self.pairs)

    def evaluate(self, feats_by_path: dict) -> list[tuple[str, float]]:
        scores, labels = [], []
        for p1, p2, label in self.pairs:
            f1, f2 = feats_by_path[p1], feats_by_path[p2]
            scores.append(float(np.dot(f1, f2)))
            labels.append(label)
        return verification_metrics(labels, scores, list(self.metrics_fprs))


def verification_metrics(
    labels: list[int], scores: list[float], fprs: Optional[list[float]] = None
) -> list[tuple[str, float]]:
    """ACC/EER/AUC/TPR@FPR (opensphere/dataset/utils.py:39-61)."""
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn import metrics as skm

    fpr, tpr, _ = skm.roc_curve(labels, scores, pos_label=1)
    roc = interp1d(fpr, tpr)
    eer = 100.0 * brentq(lambda x: 1.0 - x - roc(x), 0.0, 1.0)
    auc = 100.0 * skm.auc(fpr, tpr)
    tnr = 1.0 - fpr
    pos = labels.count(1)
    neg = labels.count(0)
    acc = 100.0 * float(np.max(tpr * pos + tnr * neg)) / len(labels)
    out = [("ACC", acc), ("EER", eer), ("AUC", auc)]
    for f in fprs or []:
        out.append((f"TPR@FPR={f}", 100.0 * float(roc(float(f)))))
    return out
