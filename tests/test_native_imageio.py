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
