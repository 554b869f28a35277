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

    def batches(self, batch_size: int, seed: int = 0, drop_last: bool = True,
                image_size: Optional[int] = None, n_threads: int = 8):
        """Restartable shuffled batch iterator (IterLoader semantics,
        opensphere/utils.py:55-79).

        With `image_size`, whole batches go through the native threaded
        decode+resize+flip pipeline (fairdiff.native.imageloader — the C++
        replacement for the reference's single-threaded cv2 loop); without
        it, or when the native lib is unavailable, falls back to the
        per-item cv2 path."""
        rng = np.random.default_rng(seed)
        native = None
        if image_size is not None:
            from fairdiff.native import imageloader_lib

            native = imageloader_lib if imageloader_lib.native_available() else None
        while True:
            order = rng.permutation(len(self))
            for s in range(0, len(order) - (batch_size - 1 if drop_last else 0), batch_size):
                idx = order[s : s + batch_size]
                if native is not None:
                    flips = (
                        None if self.test_mode
                        else rng.random(len(idx)) > 0.5
                    )
                    imgs = native.load_batch(
                        [self.items[i][0] for i in idx],
                        (image_size, image_size),
                        flips=flips, n_threads=n_threads,
                    )
                    yield imgs, self.labels[idx]
                else:
                    imgs, labels = zip(*(self[i] for i in idx))
                    if image_size is not None:
                        # parity with the native path: honor the requested
                        # resolution so on-disk image sizes (possibly
                        # heterogeneous) never leak into the batch shape
                        import cv2

                        imgs = [
                            img if img.shape[0] == img.shape[1] == image_size
                            else cv2.resize(img, (image_size, image_size))
                            for img in imgs
                        ]
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


@dataclasses.dataclass
class ItemDataset:
    """Dataset over pre-built data_items dicts (opensphere/dataset/item_dataset.py).

    Each item is an `image_pipeline` info dict ({"path": ..., optional
    landmarks/crop_size}); used for ad-hoc feature extraction."""

    data_items: list
    test_mode: bool = True

    def __len__(self):
        return len(self.data_items)

    def __getitem__(self, i):
        return image_pipeline(self.data_items[i], self.test_mode), i


class IJBDataset:
    """IJB-B/C template-based 1:1 verification + 1:N identification
    (opensphere/dataset/ijb_dataset.py:15-266), re-designed around
    vectorized segment aggregation instead of per-template Python loops.

    Metadata files (IJB distribution format):
      - data_ann: `path x1 y1 ... x5 y5 faceness` per image (5-pt landmarks)
      - tmpl_ann: `path tmpl_id media_id` per image (tid_mid file)
      - gallery/probe_ann: CSV with header, cols `tmpl_id,subj_id,...`
      - pair_ann: `tmpl_id0 tmpl_id1 label` verification pairs

    Template features: each image feat is scaled by its faceness score and by
    1/(#images sharing its media within the template), then averaged per
    template and L2-normalized (ref feat2template:158-174).
    """

    def __init__(
        self,
        data_dir: str,
        meta_dir: str,
        data_ann_file: str,
        tmpl_ann_file: str,
        gallery_ann_files: Sequence[str],
        probe_ann_files: Sequence[str],
        pair_ann_file: str,
        src_landmark: Sequence[Sequence[float]],
        test_mode: bool = True,
    ):
        self.data_dir = data_dir
        self.src_landmark = np.asarray(src_landmark, np.float32).reshape(5, 2)
        self.test_mode = test_mode
        meta = Path(meta_dir)

        # per-image landmarks + faceness
        self.data_items = []
        with open(meta / data_ann_file) as f:
            for line in f:
                terms = line.rstrip().split(" ")
                self.data_items.append(
                    {
                        "path": terms[0],
                        "tgz_landmark": np.asarray(
                            [float(t) for t in terms[1:-1]], np.float32
                        ).reshape(5, 2),
                        "faceness": float(terms[-1]),
                    }
                )

        # template/media structure -> flat segment arrays
        tmpl_ids, media_ids = [], []
        with open(meta / tmpl_ann_file) as f:
            for line in f:
                terms = line.rstrip().split(" ")
                tmpl_ids.append(int(terms[1]))
                media_ids.append(int(terms[2]))
        tmpl_ids = np.asarray(tmpl_ids)
        media_ids = np.asarray(media_ids)
        uniq_tmpl, self._segments = np.unique(tmpl_ids, return_inverse=True)
        self._tmpl_posn = {int(t): i for i, t in enumerate(uniq_tmpl)}
        self.num_templates = len(uniq_tmpl)
        # weight = 1 / (#images with same (template, media))
        pair_key = tmpl_ids.astype(np.int64) * (media_ids.max() + 1) + media_ids
        _, inv, counts = np.unique(pair_key, return_inverse=True, return_counts=True)
        self._weights = (1.0 / counts[inv]).astype(np.float32)
        self._tmpl_sizes = np.bincount(self._segments, minlength=self.num_templates)

        # 1:N gallery/probe: first occurrence of each template wins (ref :106-120)
        self.iden_info = {
            "g": self._parse_1n(meta, gallery_ann_files),
            "p": self._parse_1n(meta, probe_ann_files),
        }
        # 1:1 pairs
        p0, p1, labels = [], [], []
        with open(meta / pair_ann_file) as f:
            for line in f:
                t0, t1, lab = line.rstrip().split(" ")[:3]
                p0.append(self._tmpl_posn[int(t0)])
                p1.append(self._tmpl_posn[int(t1)])
                labels.append(int(lab))
        self.veri_info = {
            "posn_ids0": np.asarray(p0),
            "posn_ids1": np.asarray(p1),
            "labels": np.asarray(labels),
        }

    def _parse_1n(self, meta: Path, ann_files: Sequence[str]) -> dict:
        seen, posn_ids, subj_ids = set(), [], []
        for ann in ann_files:
            with open(meta / ann) as f:
                for line in list(f)[1:]:
                    terms = line.rstrip().split(",")
                    tmpl_id, subj_id = int(terms[0]), int(terms[1])
                    if tmpl_id in seen:
                        continue
                    seen.add(tmpl_id)
                    posn_ids.append(self._tmpl_posn[tmpl_id])
                    subj_ids.append(subj_id)
        return {"posn_ids": np.asarray(posn_ids), "subj_ids": np.asarray(subj_ids)}

    def __len__(self):
        return len(self.data_items)

    def __getitem__(self, idx):
        item = self.data_items[idx]
        info = {
            "path": str(Path(self.data_dir) / item["path"]),
            "src_landmark": self.src_landmark,
            "tgz_landmark": item["tgz_landmark"],
            "crop_size": [112, 112],
        }
        return image_pipeline(info, self.test_mode), idx

    def feat2template(self, feats: np.ndarray) -> np.ndarray:
        """(n_images, d) -> (n_templates, d) L2-normalized; one segment-sum
        instead of the reference's per-template loop (ref :158-174)."""
        faceness = np.asarray([it["faceness"] for it in self.data_items], np.float32)
        weighted = feats * (faceness * self._weights)[:, None]
        tmpl = np.zeros((self.num_templates, feats.shape[1]), np.float32)
        np.add.at(tmpl, self._segments, weighted)
        tmpl /= np.maximum(self._tmpl_sizes, 1)[:, None]
        norms = np.linalg.norm(tmpl, axis=1, keepdims=True)
        return tmpl / np.clip(norms, 1e-12, None)

    def evaluate_11(
        self, tmpl_feats: np.ndarray, fprs: Sequence[float] = tuple(10.0**p for p in range(-6, 0))
    ) -> list[tuple[str, float]]:
        f0 = tmpl_feats[self.veri_info["posn_ids0"]]
        f1 = tmpl_feats[self.veri_info["posn_ids1"]]
        scores = np.einsum("nd,nd->n", f0, f1)
        metrics = verification_metrics(
            self.veri_info["labels"].tolist(), scores.tolist(), list(fprs)
        )
        return [m for m in metrics if m[0].startswith("TPR")]

    def evaluate_1n(
        self,
        tmpl_feats: np.ndarray,
        topk: Sequence[int] = (1, 5, 10),
        fpirs: Sequence[float] = (1e-2, 1e-1),
    ) -> tuple[list[tuple[str, float]], list[tuple[str, float]]]:
        g, p = self.iden_info["g"], self.iden_info["p"]
        g_feats = tmpl_feats[g["posn_ids"]]
        p_feats = tmpl_feats[p["posn_ids"]]
        n_probe = len(p["subj_ids"])

        scores = p_feats @ g_feats.T
        order = np.argsort(-scores, axis=1)[:, : max(topk)]
        correct = g["subj_ids"][order] == p["subj_ids"][:, None]
        topk_accs = [
            (f"top{k}", 100.0 * float(np.any(correct[:, :k], axis=1).mean()))
            for k in topk
        ]

        mask = p["subj_ids"][:, None] == g["subj_ids"][None, :]
        pos_scores = scores[mask]
        neg_scores = np.sort(scores[~mask])[::-1]
        tpirs = []
        for fpir in fpirs:
            k = int(np.ceil(fpir * n_probe))
            th = neg_scores[k - 1]
            tpirs.append(
                (f"TPIR@FPIR={fpir}", 100.0 * float((pos_scores > th).sum()) / n_probe)
            )
        return topk_accs, tpirs

    def evaluate(self, feats: np.ndarray) -> list[tuple[str, float]]:
        tmpl_feats = self.feat2template(np.asarray(feats, np.float32))
        tprs = self.evaluate_11(tmpl_feats)
        topk_accs, tpirs = self.evaluate_1n(tmpl_feats)
        return tprs + topk_accs + tpirs


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
