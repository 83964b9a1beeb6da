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


def test_mini_masks_matches_python_chain():
    """imgio_mini_masks must equal resize-full -> flip -> crop -> resize
    (transforms.resize_shortest_edge + make_mini_masks) for both flips."""
    from detectron2_tensorflow_tpu.data.transforms import make_mini_masks

    rng = np.random.default_rng(7)
    h, w, nh, nw, mini = 120, 200, 80, 133, 28
    n = 6
    masks = np.zeros((n, h, w), np.uint8)
    boxes_orig = []
    for i in range(n):
        x0, y0 = rng.integers(0, w - 40), rng.integers(0, h - 40)
        bw, bh = rng.integers(10, 40), rng.integers(10, 40)
        cv2.ellipse(masks[i], (x0 + bw // 2, y0 + bh // 2),
                    (bw // 2, bh // 2), 0, 0, 360, 1, -1)
        boxes_orig.append([x0, y0, x0 + bw, y0 + bh])
    boxes_orig = np.asarray(boxes_orig, np.float32)

    for flip in (False, True):
        b = boxes_orig.copy()
        if flip:
            b[:, [0, 2]] = w - b[:, [2, 0]]
        b = b * np.array([nw / w, nh / h, nw / w, nh / h], np.float32)
        got = native_io.mini_masks(masks, (nh, nw), flip, b, mini)
        resized = np.stack([
            cv2.resize(m.astype(np.float32), (nw, nh),
                       interpolation=cv2.INTER_LINEAR)
            for m in masks
        ])
        if flip:
            resized = resized[:, :, ::-1]
        want = make_mini_masks(resized, b, mini)
        np.testing.assert_allclose(got, want, atol=2e-3), flip


def test_train_image_batch_matches_python_pipeline():
    """Per-image random min_size + flip: the fused call must equal
    flip-original -> cv2 resize -> pad (augment-then-resize order; mirror
    commutes with the half-pixel bilinear grid)."""
    datas = [_test_jpeg(120, 200, seed=1), _test_jpeg(100, 150, seed=2),
             _test_jpeg(140, 210, seed=3)]
    min_sizes = [80, 64, 72]
    flips = [1, 0, 1]
    bucket = (96, 160)
    out, hw = native_io.train_image_batch(datas, min_sizes, 160, flips, bucket)
    for i, d in enumerate(datas):
        img = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(d, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB,
        )
        if flips[i]:
            img = img[:, ::-1]
        h, w = img.shape[:2]
        scale = min_sizes[i] / min(h, w)
        if max(h, w) * scale > 160:
            scale = 160 / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        assert tuple(hw[i]) == (nh, nw)
        want = np.zeros(bucket + (3,), np.float32)
        want[:nh, :nw] = cv2.resize(
            img.astype(np.float32), (nw, nh), interpolation=cv2.INTER_LINEAR
        )
        assert np.abs(out[i] - want).max() <= 4.0


def test_native_train_loader_matches_python_loader(tmp_path):
    """With the random draws pinned (single MIN_SIZE_TRAIN, no flip), the
    fused train loader must reproduce build_dataloader(training=True):
    same batch composition, GT arrays, mini-masks, and images within
    decoder rounding."""
    import itertools
    import json

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.data import (
        CocoDataset,
        build_dataloader,
        build_native_train_loader,
        native_train_loader_usable,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, anns = [], []
    aid = 0
    for i, (h, w) in enumerate([(120, 200), (100, 150), (140, 210), (90, 160)]):
        data = _test_jpeg(h, w, seed=20 + i)
        (img_dir / f"{i}.jpg").write_bytes(data)
        images.append({"id": i + 1, "file_name": f"{i}.jpg", "height": h, "width": w})
        for _ in range(2):
            aid += 1
            x0, y0 = 10 + 7 * aid % 40, 8 + 5 * aid % 30
            anns.append({
                "id": aid, "image_id": i + 1, "category_id": 1,
                "bbox": [x0, y0, 30, 25], "area": 750, "iscrowd": 0,
                "segmentation": [[x0, y0, x0 + 30, y0, x0 + 30, y0 + 25,
                                  x0, y0 + 25]],
            })
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "thing"}],
    }))

    cfg = get_cfg()
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.AUGMENT.HORIZONTAL_FLIP = False  # pin the only remaining coin
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN = (80,)
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN = 160
    cfg.INPUT.PAD_BUCKETS = [[96, 160], [160, 96]]
    cfg.INPUT.MAX_GT_INSTANCES = 8
    dataset = CocoDataset(str(ann_file), str(img_dir))
    assert native_train_loader_usable(cfg, dataset)

    std = list(itertools.islice(build_dataloader(cfg, dataset, training=True, seed=5), 4))
    nat = list(itertools.islice(build_native_train_loader(cfg, dataset, seed=5), 4))
    for sb, nb in zip(std, nat):
        assert set(sb) == set(nb)
        np.testing.assert_array_equal(sb["image_id"], nb["image_id"])
        np.testing.assert_array_equal(sb["image_size"], nb["image_size"])
        np.testing.assert_array_equal(sb["gt_valid"], nb["gt_valid"])
        np.testing.assert_allclose(sb["gt_boxes"], nb["gt_boxes"], atol=1e-4)
        np.testing.assert_array_equal(sb["gt_classes"], nb["gt_classes"])
        np.testing.assert_allclose(sb["gt_masks"], nb["gt_masks"], atol=2e-3)
        assert np.abs(sb["image"] - nb["image"]).max() <= 4.0


def test_native_train_loader_flip_consistency(tmp_path):
    """With flips on, the native loader's image and GT must agree with each
    other: re-deriving boxes from the flipped image content column-sums
    would be brittle, so instead check mask/box consistency — every
    mini-mask's mass must sit inside its (flipped) box when pasted."""
    import itertools
    import json

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.data import (
        CocoDataset,
        build_native_train_loader,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, anns = [], []
    for i in range(4):
        h, w = 120, 200
        data = _test_jpeg(h, w, seed=40 + i)
        (img_dir / f"{i}.jpg").write_bytes(data)
        images.append({"id": i + 1, "file_name": f"{i}.jpg", "height": h, "width": w})
        anns.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [20, 30, 40, 35], "area": 1400, "iscrowd": 0,
            "segmentation": [[20, 30, 60, 30, 60, 65, 20, 65]],
        })
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": 1, "name": "thing"}],
    }))

    cfg = get_cfg()
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.AUGMENT.HORIZONTAL_FLIP = True
    cfg.TRANSFORM.RESIZE.MIN_SIZE_TRAIN = (80,)
    cfg.TRANSFORM.RESIZE.MAX_SIZE_TRAIN = 160
    cfg.INPUT.PAD_BUCKETS = [[96, 160]]
    cfg.INPUT.MAX_GT_INSTANCES = 4
    dataset = CocoDataset(str(ann_file), str(img_dir))
    batches = list(itertools.islice(build_native_train_loader(cfg, dataset, seed=1), 2))
    for b in batches:
        for k in range(len(b["image"])):
            nh, nw = b["image_size"][k]
            assert b["image"][k][:nh, :nw].std() > 1.0  # real content
            assert not b["image"][k][nh:].any()  # padding stays zero
            for g in range(int(b["gt_valid"][k].sum())):
                box = b["gt_boxes"][k][g]
                assert 0 <= box[0] < box[2] <= nw + 1e-3
                assert 0 <= box[1] < box[3] <= nh + 1e-3
                assert b["gt_masks"][k][g].sum() > 0.5 * 28 * 28 * 0.5
