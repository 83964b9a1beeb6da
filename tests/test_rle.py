"""COCO RLE codec: native C++ core vs numpy fallback vs dense ground truth."""

import numpy as np
import pytest

from detectron2_tensorflow_tpu.evaluation import rle as R


def _rand_mask(rng, h=37, w=53, p=0.3):
    return (rng.uniform(0, 1, (h, w)) < p).astype(np.uint8)


def test_counts_roundtrip_and_column_major():
    m = np.zeros((3, 4), np.uint8)
    m[0, 1] = 1  # column-major flat index 3
    counts = R.encode_counts(m)
    # col-major: 3 zeros, 1 one, 8 zeros
    np.testing.assert_array_equal(counts, [3, 1, 8])
    np.testing.assert_array_equal(R.decode_counts(counts, 3, 4), m)

    # mask starting with a 1 needs the leading empty zero-run
    m2 = np.ones((2, 2), np.uint8)
    np.testing.assert_array_equal(R.encode_counts(m2), [0, 4])


def test_native_matches_numpy_fallback():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = _rand_mask(rng)
        nat = R.encode_counts(m)
        ref = R._encode_counts_np(m)
        np.testing.assert_array_equal(nat, ref)
        np.testing.assert_array_equal(
            R.decode_counts(nat, *m.shape), R._decode_counts_np(ref, *m.shape)
        )
        assert R.compress(nat) == R._compress_np(nat)
        np.testing.assert_array_equal(
            R.decompress(R.compress(nat)), R._decompress_np(R._compress_np(ref))
        )


def test_compressed_string_roundtrip_with_negative_deltas():
    # deltas against counts[i-2] go negative when runs shrink
    counts = np.asarray([7, 300, 2, 1, 900, 45, 0, 3], np.int64)
    assert list(R.decompress(R.compress(counts))) == list(counts)
    # numpy fallback agrees byte-for-byte
    assert R.compress(counts) == R._compress_np(counts)


def test_encode_decode_full_dict():
    rng = np.random.default_rng(1)
    m = _rand_mask(rng, 64, 48)
    d = R.encode(m)
    assert d["size"] == [64, 48] and isinstance(d["counts"], bytes)
    np.testing.assert_array_equal(R.decode(d), m)
    assert R.area(d) == int(m.sum())


def test_rle_iou_matches_dense():
    rng = np.random.default_rng(2)
    dts = [R.encode(_rand_mask(rng, 32, 40, 0.4)) for _ in range(3)]
    gts = [R.encode(_rand_mask(rng, 32, 40, 0.4)) for _ in range(2)]
    got = R.iou(dts, gts)
    for i in range(3):
        dm = R.decode(dts[i]).astype(bool)
        for j in range(2):
            gm = R.decode(gts[j]).astype(bool)
            inter = np.logical_and(dm, gm).sum()
            union = np.logical_or(dm, gm).sum()
            assert abs(got[i, j] - inter / union) < 1e-12

    # crowd: union = det area
    crowd = R.iou(dts[:1], gts[:1], iscrowd=[True])
    dm = R.decode(dts[0]).astype(bool)
    gm = R.decode(gts[0]).astype(bool)
    want = np.logical_and(dm, gm).sum() / dm.sum()
    assert abs(crowd[0, 0] - want) < 1e-12


def test_leading_one_mask_iou():
    # run lists with an empty leading zero-run exercise the zero-skip path
    a = np.ones((8, 8), np.uint8)
    b = np.zeros((8, 8), np.uint8)
    b[:4] = 1
    v = R.iou([R.encode(a)], [R.encode(b)])
    assert abs(v[0, 0] - 0.5) < 1e-12


def test_coco_results_writer(tmp_path):
    import json

    from detectron2_tensorflow_tpu.evaluation.coco_results import (
        CocoResultsWriter,
    )
    from detectron2_tensorflow_tpu.evaluation import rle as R

    w = CocoResultsWriter({0: 7, 1: 11})
    mask = np.zeros((20, 30), np.uint8)
    mask[5:15, 5:25] = 1
    w.add_image(
        image_id=42,
        boxes=np.array([[5.0, 5.0, 25.0, 15.0]]),
        scores=np.array([0.9]),
        classes=np.array([1]),
        masks=mask[None],
        keypoints=None,
    )
    path = tmp_path / "res.json"
    n = w.save(str(path))
    assert n == 1
    rec = json.load(open(path))[0]
    assert rec["image_id"] == 42 and rec["category_id"] == 11
    assert rec["bbox"] == [5.0, 5.0, 20.0, 10.0]
    # segmentation round-trips through the COCO string format
    seg = rec["segmentation"]
    back = R.decode({"size": seg["size"], "counts": seg["counts"]})
    np.testing.assert_array_equal(back, mask)
