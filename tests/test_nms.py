import pytest
import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.ops import class_aware_nms, matrix_nms, nms, nms_fixed


def greedy_nms_reference(boxes, scores, thresh):
    """Plain sequential greedy NMS (the semantics CUDA/tf.image NMS implement)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx0 = max(boxes[i, 0], boxes[j, 0])
            yy0 = max(boxes[i, 1], boxes[j, 1])
            xx1 = min(boxes[i, 2], boxes[j, 2])
            yy1 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx1 - xx0) * max(0.0, yy1 - yy0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / max(a_i + a_j - inter, 1e-8)
            if iou > thresh and scores[j] <= scores[i]:
                suppressed[j] = True
    return sorted(keep)


def _random_boxes(rng, n, size=100.0):
    ctr = rng.uniform(10, size - 10, (n, 2))
    wh = rng.uniform(2, 30, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=1).astype(np.float32)


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(0)
    for n in [10, 100, 300]:  # spans <1 block and multi-block paths
        boxes = _random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        for thresh in [0.3, 0.5, 0.7]:
            order, keep, _ = nms(jnp.asarray(boxes), jnp.asarray(scores), thresh)
            got = sorted(np.asarray(order)[np.asarray(keep)].tolist())
            want = greedy_nms_reference(boxes, scores, thresh)
            assert got == want, f"n={n} t={thresh}"


def test_nms_respects_valid_mask():
    boxes = jnp.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
    )
    scores = jnp.array([0.9, 0.95, 0.5])
    # Highest-scoring box invalidated: the overlapping lower one must survive.
    valid = jnp.array([True, False, True])
    order, keep, _ = nms(boxes, scores, 0.5, valid=valid)
    kept = set(np.asarray(order)[np.asarray(keep)].tolist())
    assert kept == {0, 2}


def test_nms_fixed_shape_and_padding():
    rng = np.random.default_rng(1)
    boxes = _random_boxes(rng, 40)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    out_boxes, out_scores, out_idx, out_valid = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=64
    )
    assert out_boxes.shape == (64, 4)
    n_kept = len(greedy_nms_reference(boxes, scores, 0.5))
    assert int(out_valid.sum()) == n_kept
    # Scores must be descending over the valid prefix.
    vs = np.asarray(out_scores)[np.asarray(out_valid)]
    assert np.all(np.diff(vs) <= 0)


def test_class_aware_nms_keeps_cross_class_overlaps():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    classes = jnp.array([0, 1])
    _, _, _, valid = class_aware_nms(boxes, scores, classes, 0.5, 4)
    assert int(valid.sum()) == 2  # identical boxes, different classes: both live
    _, _, _, valid_agn = class_aware_nms(
        boxes, scores, classes, 0.5, 4, class_agnostic=True
    )
    assert int(valid_agn.sum()) == 1


def test_matrix_nms_decays_overlaps():
    # Two nearly identical masks (same class): the second must decay hard.
    m = np.zeros((3, 32, 32), np.float32)
    m[0, 4:20, 4:20] = 1
    m[1, 4:20, 5:21] = 1  # heavy overlap with 0
    m[2, 24:30, 24:30] = 1  # disjoint
    labels = jnp.array([1, 1, 1])
    scores = jnp.array([0.9, 0.8, 0.7])
    out = np.asarray(matrix_nms(jnp.asarray(m), labels, scores, kernel="gaussian"))
    assert out[0] == 0.9  # top mask never decays
    assert out[1] < 0.4  # heavily suppressed
    assert out[2] > 0.65  # barely touched


def test_matrix_nms_class_separation():
    m = np.zeros((2, 16, 16), np.float32)
    m[:, 2:10, 2:10] = 1  # identical masks
    labels = jnp.array([0, 1])
    scores = jnp.array([0.9, 0.8])
    out = np.asarray(matrix_nms(jnp.asarray(m), labels, scores))
    assert out[1] > 0.75  # different class: no suppression


def test_spatial_top_k_matches_flat_top_k():
    """Windowed preselect must be EXACT vs lax.top_k (distinct scores)."""
    import jax

    from detectron2_tensorflow_tpu.ops.topk import spatial_top_k

    rng = np.random.default_rng(7)
    for h, w, a, k in [(50, 84, 3, 1000), (37, 61, 3, 500), (13, 21, 3, 1000),
                       (200, 336, 3, 1000), (8, 8, 2, 5)]:
        # permutation scores: globally distinct, so top-k is unambiguous
        scores = rng.permutation(h * w * a).astype(np.float32)
        scores = jnp.asarray(scores.reshape(h, w, a))
        want_v, want_i = jax.lax.top_k(scores.reshape(-1), min(k, h * w * a))
        got_v, got_i = spatial_top_k(scores, k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_array_equal(
            np.sort(np.asarray(got_i)), np.sort(np.asarray(want_i))
        )


def test_flat_top_k_matches_lax_top_k():
    """1-D windowed preselect must be EXACT vs lax.top_k (distinct scores),
    including the fallback shapes (k > n//window, n not a window multiple)."""
    import jax

    from detectron2_tensorflow_tpu.ops.topk import flat_top_k

    rng = np.random.default_rng(3)
    for n, k in [(80000, 2000), (80000, 100), (4096, 512), (1000, 900),
                 (1001, 100), (64, 64), (16, 5)]:
        scores = jnp.asarray(rng.permutation(n).astype(np.float32))
        want_v, want_i = jax.lax.top_k(scores, min(k, n))
        got_v, got_i = flat_top_k(scores, k)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_array_equal(
            np.sort(np.asarray(got_i)), np.sort(np.asarray(want_i))
        )


@pytest.mark.slow
def test_nms_max_keep_early_exit_matches_full_sweep():
    """nms(max_keep=k) stops the block sweep at k survivors; its top-k
    survivors must equal the full sweep's (greedy prefix property)."""
    from detectron2_tensorflow_tpu.ops.nms import nms

    rng = np.random.default_rng(11)
    n = 3000
    ctr = rng.uniform(0, 800, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order_f, keep_f, kept_f = (
        np.asarray(x) for x in nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    )
    full_survivors = order_f[keep_f]
    for k in (10, 100, 500):
        order, keep, kept = (
            np.asarray(x)
            for x in nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_keep=k)
        )
        early = order[keep]
        assert len(early) >= min(k, len(full_survivors))
        np.testing.assert_array_equal(early[:k], full_survivors[:k])


def test_nms_max_keep_prefix_shortfall_runs_exact_tail():
    """When the 2*max_keep prefix yields FEWER than max_keep survivors
    (heavy suppression), the while tail must finish the sweep and still
    match the full sweep exactly — including survivor exhaustion."""
    rng = np.random.default_rng(13)
    n, ncl = 2000, 40
    centers = rng.uniform(50, 750, (ncl, 2))
    which = rng.integers(0, ncl, n)
    ctr = centers[which] + rng.normal(0, 1.5, (n, 2))  # near-identical boxes
    wh = 40 + rng.normal(0, 1.0, (n, 2))
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    order_f, keep_f, _ = (
        np.asarray(x) for x in nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    )
    full_survivors = order_f[keep_f]
    # sanity: the scenario really is survivor-starved vs the prefix sizes
    assert len(full_survivors) < 150, len(full_survivors)
    for k in (100, 500):  # prefix = 256 / 1024 of 2000: both fall short
        order, keep, _ = (
            np.asarray(x)
            for x in nms(
                jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_keep=k
            )
        )
        early = order[keep]
        np.testing.assert_array_equal(
            early[: min(k, len(full_survivors))],
            full_survivors[: min(k, len(full_survivors))],
        )


def test_pallas_keep_kernel_matches_xla_sweep():
    """ops/pallas/nms_keep.py (interpret mode) must equal the XLA blocked
    fixed-point sweep bit-for-bit — full sweep and max_keep prefix."""
    import jax

    from detectron2_tensorflow_tpu.ops.pallas.nms_keep import greedy_keep

    rng = np.random.default_rng(7)
    for n, thresh, mk in [(96, 0.5, None), (400, 0.6, None), (700, 0.5, 100)]:
        boxes = _random_boxes(rng, n, size=200.0)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        valid = rng.uniform(0, 1, n) > 0.15
        order, keep_ref, kept_scores = jax.jit(
            lambda b, s, v: nms(b, s, thresh, v, max_keep=mk)
        )(boxes, scores, valid)
        sorted_boxes = jnp.take(jnp.asarray(boxes), order, axis=0)
        sorted_scores = jnp.take(
            jnp.where(jnp.asarray(valid), jnp.asarray(scores), -1e10), order
        )
        keep_pl = greedy_keep(
            sorted_boxes, sorted_scores > -5e9, thresh, max_keep=mk,
            interpret=True,
        )
        if mk is None:
            np.testing.assert_array_equal(
                np.asarray(keep_ref), np.asarray(keep_pl)
            )
        else:
            # Both paths are prefix-exact: the top-mk survivors agree.
            ref = np.asarray(order)[np.asarray(keep_ref)][:mk]
            got = np.asarray(order)[np.asarray(keep_pl)][:mk]
            np.testing.assert_array_equal(ref, got)


def test_pallas_keep_kernel_chained_overlaps():
    """Worst case for the within-block fixed point: a line of boxes where
    each overlaps only its neighbors, so keep/suppress alternates and the
    suppression chain spans the whole block."""
    import jax

    from detectron2_tensorflow_tpu.ops.pallas.nms_keep import greedy_keep

    n = 256
    # Box i spans [6i, 6i+10): IoU with neighbor = 4/16 = 0.25 > 0.2.
    x0 = 6.0 * np.arange(n, dtype=np.float32)
    boxes = np.stack([x0, np.zeros(n, np.float32), x0 + 10.0,
                      np.full(n, 10.0, np.float32)], axis=1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)  # descending
    valid = np.ones(n, bool)
    order, keep_ref, _ = jax.jit(
        lambda b, s, v: nms(b, s, 0.2, v)
    )(boxes, scores, valid)
    keep_pl = greedy_keep(
        jnp.take(jnp.asarray(boxes), order, axis=0),
        jnp.ones(n, bool), 0.2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(keep_ref), np.asarray(keep_pl))
    # Greedy on an alternating chain keeps exactly the even positions.
    np.testing.assert_array_equal(
        np.asarray(keep_pl), (np.arange(n) % 2 == 0)
    )


def test_presorted_matches_sorted_path():
    """presorted=True on pre-top_k'd input must reproduce the sorting
    path's survivors exactly (keep masks indexed back to the input)."""
    import jax

    rng = np.random.default_rng(11)
    n = 300
    boxes = _random_boxes(rng, n, size=150.0)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.uniform(0, 1, n) > 0.2
    # Caller-side sort, as every production call site does.
    ss, order = jax.lax.top_k(jnp.where(jnp.asarray(valid), scores, -1e10), n)
    sb = jnp.take(jnp.asarray(boxes), order, axis=0)
    sv = ss > -5e9
    b1, s1, i1, v1 = nms_fixed(sb, ss, 0.5, 40, valid=sv, presorted=True)
    b0, s0, i0, v0 = nms_fixed(boxes, scores, 0.5, 40, valid=valid)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1))
    # presorted indices point into the SORTED array; map back via order.
    np.testing.assert_array_equal(
        np.asarray(order)[np.asarray(i1)][np.asarray(v1)],
        np.asarray(i0)[np.asarray(v0)],
    )
    np.testing.assert_allclose(np.asarray(b0), np.asarray(b1))
