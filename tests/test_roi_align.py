import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.ops import roi_align


def roi_align_reference(features, boxes, spatial_scale, output_size, sampling_ratio):
    """Literal numpy transcription of Detectron2's aligned=True ROIAlign math
    (the published CUDA kernel algorithm), used as the golden oracle."""
    h, w, c = features.shape
    n = len(boxes)
    out = np.zeros((n, output_size, output_size, c), np.float32)
    for ni in range(n):
        x0 = boxes[ni, 0] * spatial_scale - 0.5
        y0 = boxes[ni, 1] * spatial_scale - 0.5
        roi_w = (boxes[ni, 2] - boxes[ni, 0]) * spatial_scale
        roi_h = (boxes[ni, 3] - boxes[ni, 1]) * spatial_scale
        bin_w = roi_w / output_size
        bin_h = roi_h / output_size
        for oy in range(output_size):
            for ox in range(output_size):
                acc = np.zeros(c, np.float32)
                for sy in range(sampling_ratio):
                    for sx in range(sampling_ratio):
                        y = y0 + oy * bin_h + (sy + 0.5) * bin_h / sampling_ratio
                        x = x0 + ox * bin_w + (sx + 0.5) * bin_w / sampling_ratio
                        if y < -1.0 or y > h or x < -1.0 or x > w:
                            continue
                        y_ = min(max(y, 0.0), h - 1.0)
                        x_ = min(max(x, 0.0), w - 1.0)
                        yl = int(np.floor(y_))
                        xl = int(np.floor(x_))
                        yh = min(yl + 1, h - 1)
                        xh = min(xl + 1, w - 1)
                        ly, lx = y_ - yl, x_ - xl
                        acc += (
                            features[yl, xl] * (1 - ly) * (1 - lx)
                            + features[yl, xh] * (1 - ly) * lx
                            + features[yh, xl] * ly * (1 - lx)
                            + features[yh, xh] * ly * lx
                        )
                out[ni, oy, ox] = acc / (sampling_ratio * sampling_ratio)
    return out


def test_roi_align_matches_d2_math():
    rng = np.random.default_rng(0)
    feat = rng.standard_normal((24, 32, 8)).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 60.0, 40.0],
            [0.0, 0.0, 128.0, 96.0],  # whole image
            [30.0, 10.0, 34.0, 14.0],  # tiny box
            [-8.0, -8.0, 20.0, 20.0],  # partially outside
        ],
        np.float32,
    )
    scale = 0.25  # image 96x128 -> feature 24x32
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), scale, 7, 2)
    )
    want = roi_align_reference(feat, boxes, scale, 7, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_roi_align_chunked_equals_unchunked():
    rng = np.random.default_rng(1)
    feat = rng.standard_normal((16, 16, 4)).astype(np.float32)
    boxes = rng.uniform(0, 60, (37, 4)).astype(np.float32)
    boxes = np.concatenate(
        [np.minimum(boxes[:, :2], boxes[:, 2:]), np.maximum(boxes[:, :2], boxes[:, 2:])],
        axis=1,
    )
    a = roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, 7, 2, chunk_size=8)
    b = roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.25, 7, 2, chunk_size=256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_roi_align_constant_feature_invariance():
    # Pooling a constant feature map must return the constant everywhere the
    # box is inside the image.
    feat = jnp.full((20, 20, 2), 3.5)
    boxes = jnp.array([[8.0, 8.0, 56.0, 56.0]])
    out = roi_align(feat, boxes, 0.25, 7, 2)
    np.testing.assert_allclose(np.asarray(out), 3.5, atol=1e-5)


def test_roi_align_sampling_ratio_zero_resolves():
    feat = jnp.ones((8, 8, 1))
    boxes = jnp.array([[0.0, 0.0, 32.0, 32.0]])
    out = roi_align(feat, boxes, 0.25, 7, 0)  # 0 -> static 2
    assert out.shape == (1, 7, 7, 1)
