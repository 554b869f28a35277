"""Native threaded image pipeline vs the cv2 reference path."""

import numpy as np
import pytest

from fairdiff.native import imageloader_lib as il

pytestmark = pytest.mark.skipif(
    not il.native_available(), reason="native imageloader unavailable"
)


def _write_images(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (40, 32, 3), np.uint8).astype(np.uint8)
    jpg = tmp_path / "a.jpg"
    png = tmp_path / "b.png"
    Image.fromarray(arr).save(jpg, quality=95)
    Image.fromarray(arr).save(png)
    return jpg, png, arr


def test_decode_resize_normalize(tmp_path):
    jpg, png, arr = _write_images(tmp_path)
    out = il.load_batch([str(jpg), str(png)], (40, 32))
    assert out.shape == (2, 40, 32, 3)
    # png is lossless: exact normalize parity
    ref = (arr.astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(out[1], ref, atol=1e-6)
    # jpeg: lossy vs the original, but must match PIL/libjpeg's decode of
    # the same file within a couple of LSB
    from PIL import Image

    dec = np.asarray(Image.open(jpg)).astype(np.float32)
    np.testing.assert_allclose(out[0], (dec - 127.5) / 127.5, atol=2 / 127.5)


def test_resize_matches_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")
    _, png, arr = _write_images(tmp_path)
    out = il.load_batch([str(png)], (20, 16))[0]
    ref = cv2.resize(arr.astype(np.float32), (16, 20), interpolation=cv2.INTER_LINEAR)
    ref = (ref - 127.5) / 127.5
    np.testing.assert_allclose(out, ref, atol=3e-2)


def test_warp_matches_cv2(tmp_path):
    cv2 = pytest.importorskip("cv2")
    _, png, arr = _write_images(tmp_path)
    m = np.asarray([[0.8, 0.1, 2.0], [-0.05, 0.9, 1.0]], np.float32)
    out = il.load_batch([str(png)], (24, 24), mats=m[None])[0]
    ref = cv2.warpAffine(
        arr.astype(np.float32), m, (24, 24), flags=cv2.INTER_LINEAR,
        borderValue=0.0,
    )
    ref = (ref - 127.5) / 127.5
    # interiors must match closely; borders differ by partial-pixel policy
    np.testing.assert_allclose(out[2:-2, 2:-2], ref[2:-2, 2:-2], atol=2e-2)


def test_flip_and_errors(tmp_path):
    _, png, arr = _write_images(tmp_path)
    flipped = il.load_batch(
        [str(png)], (40, 32), flips=np.asarray([True])
    )[0]
    plain = il.load_batch([str(png)], (40, 32))[0]
    np.testing.assert_allclose(flipped, plain[:, ::-1, :], atol=1e-6)
    with pytest.raises(OSError):
        il.load_batch([str(tmp_path / "missing.jpg")], (8, 8))


def test_class_dataset_native_batches(tmp_path):
    from PIL import Image

    from fairdiff.facerec.datasets import ClassDataset

    rng = np.random.default_rng(1)
    lines = []
    for i in range(6):
        arr = rng.integers(0, 255, (12, 12, 3), np.uint8).astype(np.uint8)
        name = f"img{i}.png"
        Image.fromarray(arr).save(tmp_path / name)
        lines.append(f"{name} {i % 3}")
    ann = tmp_path / "ann.txt"
    ann.write_text("\n".join(lines))
    ds = ClassDataset(str(tmp_path), str(ann))
    imgs, labels = next(ds.batches(4, seed=0, image_size=12))
    assert imgs.shape == (4, 12, 12, 3) and labels.shape == (4,)
    assert imgs.dtype == np.float32
    assert np.abs(imgs).max() <= 1.0
