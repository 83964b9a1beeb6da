import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.ops import roi_align


def roi_align_reference(features, boxes, spatial_scale, output_size, sampling_ratio):
    """Literal numpy transcription of Detectron2's aligned=True ROIAlign math
    (the published CUDA kernel algorithm), used as the golden oracle.

    ``sampling_ratio=0`` is D2's adaptive rule: per ROI and per axis,
    ``ceil(roi_extent / out)`` samples per bin (no lower clamp — a
    degenerate axis yields zero samples and the bin divides by
    ``max(count, 1)``, i.e. outputs exact zeros)."""
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
        gh = sampling_ratio if sampling_ratio > 0 else int(
            np.ceil(roi_h / output_size)
        )
        gw = sampling_ratio if sampling_ratio > 0 else int(
            np.ceil(roi_w / output_size)
        )
        count = max(gh * gw, 1)
        for oy in range(output_size):
            for ox in range(output_size):
                acc = np.zeros(c, np.float32)
                for sy in range(gh):
                    for sx in range(gw):
                        y = y0 + oy * bin_h + (sy + 0.5) * bin_h / gh
                        x = x0 + ox * bin_w + (sx + 0.5) * bin_w / gw
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
                out[ni, oy, ox] = acc / count
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


def test_roi_align_adaptive_matches_d2_math():
    # sampling_ratio=0 = D2's per-ROI, per-axis adaptive ceil rule. Box
    # sizes chosen so the selected grids span 1..5 samples per bin and
    # differ between the two axes.
    rng = np.random.default_rng(7)
    feat = rng.standard_normal((24, 32, 4)).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 60.0, 40.0],      # grid 2 x 2
            [0.0, 0.0, 128.0, 96.0],     # whole image: grid 5 x 4
            [30.0, 10.0, 34.0, 14.0],    # tiny: grid 1 x 1
            [2.0, 2.0, 120.0, 16.0],     # wide: grid 5 x 1
            [-8.0, -8.0, 20.0, 20.0],    # partially outside
            [10.0, 10.0, 10.0, 50.0],    # degenerate width -> exact zeros
        ],
        np.float32,
    )
    scale = 0.25
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), scale, 7, 0))
    want = roi_align_reference(feat, boxes, scale, 7, 0)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    assert np.all(want[5] == 0.0)  # the degenerate box really hits the rule


def test_multilevel_adaptive_matches_d2_math():
    # The production pooler path (patch-matmul plan) under the adaptive
    # rule, single level so the golden oracle applies directly.
    from detectron2_tensorflow_tpu.models.poolers import multilevel_roi_align

    rng = np.random.default_rng(8)
    feat = rng.standard_normal((48, 64, 8)).astype(np.float32)
    boxes = np.array(
        [
            [4.0, 4.0, 60.0, 40.0],
            [0.0, 0.0, 180.0, 150.0],    # grid 7 x 6 at stride 4
            [30.0, 10.0, 34.0, 14.0],
            [2.0, 2.0, 120.0, 16.0],
            [10.0, 10.0, 10.0, 50.0],    # degenerate width -> exact zeros
        ],
        np.float32,
    )
    got = np.asarray(
        multilevel_roi_align(
            [jnp.asarray(feat)], jnp.asarray(boxes), [4], 7,
            sampling_ratio=0, use_pallas=False,
        )
    )
    want = roi_align_reference(feat, boxes, 0.25, 7, 0)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    assert np.all(got[4] == 0.0)
