"""IJB template-protocol dataset, ItemDataset, config-driven facerec builder,
and profiling helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fairdiff.facerec.builder import (
    BACKBONES, build_backbone, build_head, deep_merge, fill_config,
)
from fairdiff.facerec.datasets import IJBDataset, ItemDataset
from fairdiff.utils.profiling import PhaseTimers, tree_fingerprint

SRC_LANDMARK = [
    [38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
    [41.5493, 92.3655], [70.7299, 92.2041],
]


@pytest.fixture
def ijb_meta(tmp_path):
    """6 images, 3 templates (10: imgs 0-2, 11: imgs 3-4, 12: img 5)."""
    import cv2

    meta = tmp_path / "meta"
    meta.mkdir()
    lm = " ".join("10.0" for _ in range(10))
    faceness = [0.9, 0.8, 0.7, 1.0, 0.5, 0.6]
    lines = [f"im{i}.png {lm} {faceness[i]}" for i in range(6)]
    (meta / "data.txt").write_text("\n".join(lines))
    # imgs 0,1 share media 100 within template 10 -> weight 1/2 each
    tid_mid = [(10, 100), (10, 100), (10, 101), (11, 102), (11, 103), (12, 104)]
    (meta / "tid_mid.txt").write_text(
        "\n".join(f"im{i}.png {t} {m}" for i, (t, m) in enumerate(tid_mid))
    )
    (meta / "gallery.csv").write_text(
        "TEMPLATE_ID,SUBJECT_ID,X\n10,1,0\n11,2,0\n10,1,0\n"
    )
    (meta / "probe.csv").write_text("TEMPLATE_ID,SUBJECT_ID,X\n12,1,0\n")
    (meta / "pairs.txt").write_text("10 12 1\n11 12 0\n")
    for i in range(6):
        cv2.imwrite(str(tmp_path / f"im{i}.png"), np.full((16, 16, 3), 30 * i, np.uint8))
    return tmp_path, meta, faceness, tid_mid


def _make_ds(tmp_path, meta):
    return IJBDataset(
        data_dir=str(tmp_path),
        meta_dir=str(meta),
        data_ann_file="data.txt",
        tmpl_ann_file="tid_mid.txt",
        gallery_ann_files=["gallery.csv"],
        probe_ann_files=["probe.csv"],
        pair_ann_file="pairs.txt",
        src_landmark=SRC_LANDMARK,
    )


def test_ijb_feat2template_matches_reference_semantics(ijb_meta):
    tmp_path, meta, faceness, tid_mid = ijb_meta
    ds = _make_ds(tmp_path, meta)
    assert len(ds) == 6 and ds.num_templates == 3

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(6, 4)).astype(np.float32)
    tmpl = ds.feat2template(feats)
    assert tmpl.shape == (3, 4)
    np.testing.assert_allclose(np.linalg.norm(tmpl, axis=1), 1.0, rtol=1e-5)

    # independent per-template loop with the reference's weighting rules
    for tmpl_id, posn in ds._tmpl_posn.items():
        img_ids = [i for i, (t, _) in enumerate(tid_mid) if t == tmpl_id]
        medias = [tid_mid[i][1] for i in img_ids]
        acc = np.zeros(4, np.float32)
        for i in img_ids:
            w = 1.0 / medias.count(tid_mid[i][1])
            acc += feats[i] * faceness[i] * w
        acc /= len(img_ids)
        expect = acc / np.linalg.norm(acc)
        np.testing.assert_allclose(tmpl[posn], expect, rtol=1e-5)


def test_ijb_evaluate_end_to_end(ijb_meta):
    tmp_path, meta, _, _ = ijb_meta
    ds = _make_ds(tmp_path, meta)
    # construct feats so template 12 (probe, subj 1) matches template 10
    # (gallery subj 1) and is far from 11 (subj 2)
    base = np.eye(4, dtype=np.float32)
    feats = np.stack([base[0]] * 3 + [base[1]] * 2 + [base[0]])
    metrics = dict(ds.evaluate(feats))
    assert metrics["top1"] == 100.0
    tprs = [v for k, v in metrics.items() if k.startswith("TPR")]
    assert tprs  # 1:1 path produced TPR@FPR entries

    img, idx = ds[0]  # aligned 112x112 chip in [-1,1]
    assert img.shape == (112, 112, 3) and idx == 0 and abs(img).max() <= 1.0


def test_item_dataset(tmp_path):
    import cv2

    cv2.imwrite(str(tmp_path / "a.png"), np.full((8, 8, 3), 128, np.uint8))
    ds = ItemDataset([{"path": str(tmp_path / "a.png")}])
    img, idx = ds[0]
    assert img.shape == (8, 8, 3) and idx == 0


@pytest.mark.slow  # compile-heavy (VERDICT r2 #6): fast subset skips
def test_builder_backbones_and_heads(tmp_path):
    net = build_backbone({"type": "sfnet4", "out_channel": 64, "in_size": 32})
    params = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    out = net.apply({"params": params}, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 64)

    net2 = build_backbone({"type": "iresnet18", "out_channel": 32, "in_size": 32})
    p2 = net2.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    assert net2.apply({"params": p2}, jnp.zeros((2, 32, 32, 3))).shape == (2, 32)

    fn, kwargs = build_head({"type": "CosFace", "s": 30.0, "m": 0.2,
                             "feat_dim": 64, "num_class": 10})
    assert callable(fn) and kwargs == {"s": 30.0, "m": 0.2}
    assert set(BACKBONES) >= {"sfnet20", "sfnet64", "iresnet100",
                              "sfnet20_deprecated"}

    # legacy pre-act-residual variant (sfnet_deprecated.py): same params,
    # different block ordering -> different output
    net3 = build_backbone({
        "type": "sfnet4_deprecated", "out_channel": 64, "in_size": 32,
        "layers": (0, 1, 0, 0),
    })
    net4 = build_backbone({
        "type": "sfnet4", "out_channel": 64, "in_size": 32,
        "layers": (0, 1, 0, 0),
    })
    x = jnp.ones((1, 32, 32, 3))
    p3 = net3.init(jax.random.key(1), x)
    assert net3.apply(p3, x).shape == (1, 64)
    assert float(jnp.abs(net3.apply(p3, x) - net4.apply(p3, x)).max()) > 0

    # base-block YAML inheritance (opensphere fill_config semantics)
    base = tmp_path / "base.yml"
    base.write_text("type: sfnet20\nout_channel: 512\n")
    cfg = fill_config({"backbone": {"base": str(base), "out_channel": 256}})
    assert cfg["backbone"] == {"type": "sfnet20", "out_channel": 256}
    assert deep_merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}}) == {"a": {"b": 9, "c": 2}}


def test_profiling_helpers():
    timers = PhaseTimers()
    x = jnp.ones((4,))
    with timers("phase1"):
        y = np.asarray(x * 2)  # force the fetch inside the timed block
    with timers("phase1"):
        pass
    s = timers.summary()
    assert s["phase1"] >= 0 and timers.counts["phase1"] == 2

    fp = tree_fingerprint({"w": jnp.ones((3,)), "b": jnp.zeros((2,))})
    assert fp["norm"] == pytest.approx(np.sqrt(3.0), rel=1e-6)
    assert tree_fingerprint({}) == {"first": 0.0, "norm": 0.0}
