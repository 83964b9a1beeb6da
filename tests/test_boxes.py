import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.structures import box_ops


def test_area():
    boxes = jnp.array([[0, 0, 10, 10], [5, 5, 5, 25], [3, 1, 1, 3]], jnp.float32)
    np.testing.assert_allclose(box_ops.area(boxes), [100.0, 0.0, 0.0])


def test_pairwise_iou_golden():
    # Golden values derivable by hand.
    a = jnp.array([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], jnp.float32)
    iou = np.asarray(box_ops.pairwise_iou(a, b))
    expected = np.array(
        [
            [1.0, 25.0 / 175.0, 0.0],
            [25.0 / 100.0, 0.0, 0.0],
        ]
    )
    np.testing.assert_allclose(iou, expected, atol=1e-6)


def test_matched_iou_matches_pairwise_diagonal():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, size=(8, 2, 2))
    boxes = np.concatenate([pts.min(1), pts.max(1)], axis=-1).astype(np.float32)
    pairwise = np.asarray(box_ops.pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    matched = np.asarray(box_ops.matched_iou(jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(np.diag(pairwise), matched, atol=1e-6)
    np.testing.assert_allclose(matched, 1.0, atol=1e-6)


def test_giou_known_values():
    a = jnp.array([[0, 0, 2, 2]], jnp.float32)
    b = jnp.array([[2, 2, 4, 4]], jnp.float32)
    # Disjoint diagonal boxes: iou=0, enclosing=16, union=8 -> giou = -(16-8)/16
    np.testing.assert_allclose(box_ops.matched_giou(a, b), [-0.5], atol=1e-6)
    np.testing.assert_allclose(box_ops.matched_giou(a, a), [1.0], atol=1e-6)


def test_diou_ciou_bounds():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 50, size=(16, 2, 2))
    a = np.concatenate([pts.min(1), pts.max(1)], -1).astype(np.float32)
    pts = rng.uniform(0, 50, size=(16, 2, 2))
    b = np.concatenate([pts.min(1), pts.max(1)], -1).astype(np.float32)
    diou = np.asarray(box_ops.matched_diou(jnp.asarray(a), jnp.asarray(b)))
    ciou = np.asarray(box_ops.matched_ciou(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(diou <= 1.0) and np.all(diou >= -1.0)
    assert np.all(ciou <= diou + 1e-6)  # ciou adds a nonneg penalty


def test_ioa():
    a = jnp.array([[0, 0, 10, 10]], jnp.float32)
    b = jnp.array([[0, 0, 5, 10]], jnp.float32)
    np.testing.assert_allclose(box_ops.pairwise_ioa(a, b), [[1.0]], atol=1e-6)
    np.testing.assert_allclose(box_ops.pairwise_ioa(b, a), [[0.5]], atol=1e-6)


def test_clip_and_inside():
    boxes = jnp.array([[-5, -5, 15, 15], [2, 2, 8, 8]], jnp.float32)
    clipped = box_ops.clip(boxes, (10, 12))
    np.testing.assert_allclose(clipped, [[0, 0, 12, 10], [2, 2, 8, 8]])
    inside = box_ops.inside_image(boxes, (10, 12))
    np.testing.assert_array_equal(inside, [False, True])


def test_conversions_roundtrip():
    boxes = jnp.array([[10, 20, 30, 60]], jnp.float32)
    xywh = jnp.array([[10, 20, 20, 40]], jnp.float32)
    np.testing.assert_allclose(box_ops.xywh_to_xyxy(xywh), boxes)
    norm = box_ops.to_normalized(boxes, (100, 200))
    np.testing.assert_allclose(box_ops.to_absolute(norm, (100, 200)), boxes, atol=1e-4)
