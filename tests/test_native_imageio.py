"""Native C++ image pipeline (native/imageio.cpp) vs the cv2 reference path."""

import cv2
import numpy as np
import pytest

from detectron2_tensorflow_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="no compiler/libjpeg on this host"
)


def _test_jpeg(h=97, w=143, quality=90, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth image: JPEG is lossy, so use low-frequency content to keep the
    # decoder comparison meaningful.
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            127 + 90 * np.sin(x / 17) * np.cos(y / 23),
            127 + 90 * np.cos(x / 11),
            127 + 90 * np.sin(y / 13),
        ],
        axis=-1,
    ).astype(np.uint8)
    img += rng.integers(0, 3, img.shape).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality])
    assert ok
    return bytes(enc.tobytes())


def test_jpeg_info_and_decode_match_cv2():
    data = _test_jpeg()
    assert native_io.jpeg_info(data) == (97, 143)
    got = native_io.decode_jpeg(data)
    want = cv2.cvtColor(
        cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR),
        cv2.COLOR_BGR2RGB,
    )
    assert got.shape == want.shape == (97, 143, 3)
    # Both are IJG-compatible baseline decoders; allow 1 LSB of rounding.
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_resize_bilinear_matches_cv2_float_path():
    data = _test_jpeg()
    img = native_io.decode_jpeg(data)
    got = native_io.resize_bilinear(img, 64, 96)
    want = cv2.resize(img.astype(np.float32), (96, 64), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_decode_resize_pad_fused_semantics():
    data = _test_jpeg(h=120, w=200)
    bucket = (96, 160)
    out, (nh, nw), (oh, ow) = native_io.decode_resize_pad(data, 80, 160, bucket)
    assert (oh, ow) == (120, 200)
    # shortest-edge rule: scale = 80/120 -> long side 133 <= 160.
    assert (nh, nw) == (80, 133)
    assert out.shape == (96, 160, 3) and out.dtype == np.float32
    # padding is zero
    assert np.all(out[nh:] == 0) and np.all(out[:, nw:] == 0)
    # content matches decode-then-resize
    img = native_io.decode_jpeg(data)
    want = native_io.resize_bilinear(img, nh, nw)
    np.testing.assert_allclose(out[:nh, :nw], want, atol=1e-3)


def test_decode_resize_pad_max_size_cap():
    data = _test_jpeg(h=100, w=300)
    out, (nh, nw), _ = native_io.decode_resize_pad(data, 90, 200, (128, 224))
    # scale 0.9 -> long 270 > 200, recapped to 200/300
    assert (nw, nh) == (200, round(100 * 200 / 300))


def test_bucket_overflow_raises():
    data = _test_jpeg(h=100, w=300)
    with pytest.raises(ValueError):
        native_io.decode_resize_pad(data, 300, 2000, (128, 224))


def test_decode_resize_pad_batch_matches_single():
    datas = [_test_jpeg(h, w, seed=s) for s, (h, w) in
             enumerate([(120, 200), (96, 180), (110, 190)])]
    bucket = (96, 160)
    batch, sizes = native_io.decode_resize_pad_batch(datas, 80, 160, bucket)
    assert batch.shape == (3, 96, 160, 3)
    for i, d in enumerate(datas):
        one, (nh, nw), _ = native_io.decode_resize_pad(d, 80, 160, bucket)
        assert tuple(sizes[i]) == (nh, nw)
        np.testing.assert_array_equal(batch[i], one)


def test_native_eval_loader_matches_standard_loader(tmp_path):
    """The C++ eval path must reproduce build_dataloader(training=False):
    same bucketing, same resized sizes, same padding semantics, and images
    equal to the cv2 path within JPEG-decoder rounding."""
    import json

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.data import (
        CocoDataset,
        build_dataloader,
        build_native_eval_loader,
        native_eval_loader_usable,
    )

    rng = np.random.default_rng(3)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, anns = [], []
    for i, (h, w) in enumerate([(120, 200), (100, 150), (140, 210), (90, 160), (130, 205)]):
        data = _test_jpeg(h, w, seed=10 + i)
        (img_dir / f"{i}.jpg").write_bytes(data)
        images.append({"id": i + 1, "file_name": f"{i}.jpg", "height": h, "width": w})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [5, 5, 30, 30], "area": 900, "iscrowd": 0})
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "thing"}],
    }))

    cfg = get_cfg()
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TEST = 80
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TEST = 160
    cfg.INPUT.PAD_BUCKETS = [[96, 160], [160, 96]]
    dataset = CocoDataset(str(ann_file), str(img_dir))
    assert native_eval_loader_usable(cfg, dataset)

    std = list(build_dataloader(cfg, dataset, training=False))
    nat = list(build_native_eval_loader(cfg, dataset))
    assert len(std) == len(nat)
    for sb, nb in zip(std, nat):
        np.testing.assert_array_equal(sb["image_id"], nb["image_id"])
        np.testing.assert_array_equal(sb["image_size"], nb["image_size"])
        np.testing.assert_array_equal(sb["original_size"], nb["original_size"])
        assert sb["image"].shape == nb["image"].shape
        # cv2 fixed-point decode+resize vs libjpeg float path: small pixel
        # deltas only (1 LSB decode * bilinear spread).
        assert np.abs(sb["image"] - nb["image"]).max() <= 4.0
