import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.models.anchors import DefaultAnchorGenerator
from detectron2_tensorflow_tpu.models.box_regression import Box2BoxTransform
from detectron2_tensorflow_tpu.models.matcher import Matcher
from detectron2_tensorflow_tpu.models.sampling import subsample_labels


def test_anchor_generator_matches_d2_convention():
    gen = DefaultAnchorGenerator(
        sizes=[[32]], aspect_ratios=[[1.0]], strides=[4]
    )
    anchors = gen([(2, 2)])[0]
    assert anchors.shape == (4, 4)
    # First cell: 32x32 square centered at (0, 0).
    np.testing.assert_allclose(anchors[0], [-16, -16, 16, 16])
    # Second cell along x: shifted by stride.
    np.testing.assert_allclose(anchors[1], [-12, -16, 20, 16])


def test_anchor_aspect_ratios():
    gen = DefaultAnchorGenerator(sizes=[[64]], aspect_ratios=[[0.5, 1.0, 2.0]], strides=[8])
    anchors = np.asarray(gen([(1, 1)])[0])
    areas = (anchors[:, 2] - anchors[:, 0]) * (anchors[:, 3] - anchors[:, 1])
    np.testing.assert_allclose(areas, 64.0 * 64.0, rtol=1e-5)
    ratios = (anchors[:, 3] - anchors[:, 1]) / (anchors[:, 2] - anchors[:, 0])
    np.testing.assert_allclose(sorted(ratios), [0.5, 1.0, 2.0], rtol=1e-5)


def test_box2box_roundtrip():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, (32, 2))
    src = np.concatenate([src, src + rng.uniform(5, 50, (32, 2))], -1).astype(np.float32)
    tgt = rng.uniform(0, 100, (32, 2))
    tgt = np.concatenate([tgt, tgt + rng.uniform(5, 50, (32, 2))], -1).astype(np.float32)
    t = Box2BoxTransform((10.0, 10.0, 5.0, 5.0))
    deltas = t.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = t.apply_deltas(deltas, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(rec), tgt, atol=5e-3)  # f32 exp/log


def test_box2box_scale_clamp():
    t = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])  # absurd growth
    out = t.apply_deltas(deltas, jnp.array([[0.0, 0.0, 10.0, 10.0]]))
    w = float(out[0, 2] - out[0, 0])
    assert w <= 10.0 * 1000.0 / 16.0 + 1e-3


def test_matcher_thresholds_and_ignore():
    m = Matcher([0.3, 0.7], [0, -1, 1])
    # 2 GT x 4 anchors quality matrix
    q = jnp.array(
        [
            [0.8, 0.5, 0.1, 0.0],
            [0.2, 0.6, 0.25, 0.9],
        ]
    )
    idx, labels = m(q, jnp.array([True, True]))
    np.testing.assert_array_equal(labels, [1, -1, 0, 1])
    np.testing.assert_array_equal(idx, [0, 1, 1, 1])


def test_matcher_low_quality_recovery():
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    # GT 1's best anchor has only 0.25 IoU: still becomes positive.
    q = jnp.array([[0.8, 0.1], [0.2, 0.25]])
    _, labels = m(q, jnp.array([True, True]))
    np.testing.assert_array_equal(labels, [1, 1])


def test_matcher_invalid_gt_is_background():
    m = Matcher([0.5], [0, 1], allow_low_quality_matches=True)
    q = jnp.array([[0.9, 0.9], [0.95, 0.1]])
    _, labels = m(q, jnp.array([True, False]))  # second GT padded out
    np.testing.assert_array_equal(labels, [1, 1])
    _, labels = m(q, jnp.array([False, False]))  # no GT at all
    np.testing.assert_array_equal(labels, [0, 0])


def test_matcher_chunked_matches_dense():
    """match_chunked must be bit-identical to the dense matcher, including
    low-quality tie recovery, invalid GT rows, and the folded extra_fn."""
    from detectron2_tensorflow_tpu.structures import boxes as box_ops

    rng = np.random.default_rng(5)
    g, a = 12, 1000
    gt = np.sort(rng.uniform(0, 200, (g, 2, 2)), axis=1).reshape(g, 4)
    gt = gt[:, [0, 2, 1, 3]].astype(np.float32)
    anchors = np.sort(rng.uniform(0, 200, (a, 2, 2)), axis=1).reshape(a, 4)
    anchors = anchors[:, [0, 2, 1, 3]].astype(np.float32)
    gt_valid = np.array([True] * 9 + [False] * 3)
    crowd = jnp.asarray(np.array([False] * 8 + [True] + [False] * 3))

    def extra(gtb, ac):
        ioa = box_ops.pairwise_ioa(gtb, ac)
        return jnp.any(ioa * crowd[:, None].astype(ioa.dtype) > 0.5, axis=0)

    for low in (False, True):
        m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=low)
        q = box_ops.pairwise_iou(jnp.asarray(gt), jnp.asarray(anchors))
        want_idx, want_lbl = m(q, jnp.asarray(gt_valid))
        got_idx, got_lbl, got_extra = m.match_chunked(
            jnp.asarray(gt), jnp.asarray(gt_valid), jnp.asarray(anchors),
            box_ops.pairwise_iou, chunk=96, extra_fn=extra,
        )
        np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(want_idx))
        np.testing.assert_array_equal(np.asarray(got_lbl), np.asarray(want_lbl))
        np.testing.assert_array_equal(
            np.asarray(got_extra), np.asarray(extra(jnp.asarray(gt),
                                                   jnp.asarray(anchors)))
        )


def test_subsample_labels_counts():
    key = jax.random.PRNGKey(0)
    labels = jnp.array([1] * 10 + [0] * 100 + [-1] * 20)
    idx, is_pos, valid = subsample_labels(key, labels, 64, 0.25)
    assert idx.shape == (64,)
    n_pos = int((is_pos & valid).sum())
    n_neg = int((~is_pos & valid).sum())
    assert n_pos == 10  # all positives fit under the 16 cap
    assert n_neg == 54  # negatives backfill to 64 total
    # Sampled indices point at the right labels.
    lab = np.asarray(labels)[np.asarray(idx)]
    assert np.all(lab[np.asarray(is_pos & valid)] == 1)
    assert np.all(lab[np.asarray(~is_pos & valid)] == 0)


def test_subsample_labels_scarce_negatives():
    key = jax.random.PRNGKey(1)
    labels = jnp.array([1] * 4 + [0] * 3 + [-1] * 40)
    idx, is_pos, valid = subsample_labels(key, labels, 32, 0.5)
    assert int((is_pos & valid).sum()) == 4
    assert int((~is_pos & valid).sum()) == 3
    assert int(valid.sum()) == 7  # can't invent samples


def test_subsample_positive_cap():
    key = jax.random.PRNGKey(2)
    labels = jnp.array([1] * 100 + [0] * 100)
    _, is_pos, valid = subsample_labels(key, labels, 64, 0.25)
    assert int((is_pos & valid).sum()) == 16  # capped at fraction
    assert int(valid.sum()) == 64


def test_s2d_stem_matches_plain_conv_stem():
    """The space-to-depth stem must be ARITHMETICALLY identical to the
    7x7/2 conv stem given the same [7,7,3,64] kernel."""
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.models.backbones.resnet import Stem

    x = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (2, 64, 96, 3)).astype(np.float32)
    )
    plain = Stem(norm="", space_to_depth=False)
    fast = Stem(norm="", space_to_depth=True)
    v = plain.init(jax.random.PRNGKey(0), x)
    # Same parameter tree (the converters' contract).
    v2 = fast.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    with jax.default_matmul_precision("highest"):
        y0 = plain.apply(v, x)
        y1 = fast.apply(v, x)
    assert y0.shape == y1.shape == (2, 16, 24, 64)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-5, atol=1e-4)


def test_s2d_stem_with_frozen_bn_tree():
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.models.backbones.resnet import Stem

    x = jnp.zeros((1, 32, 32, 3))
    v_plain = Stem(norm="FrozenBN", space_to_depth=False).init(
        jax.random.PRNGKey(0), x
    )
    v_fast = Stem(norm="FrozenBN", space_to_depth=True).init(
        jax.random.PRNGKey(0), x
    )
    assert jax.tree_util.tree_structure(v_plain) == jax.tree_util.tree_structure(v_fast)


def test_gcn_layer():
    """GCN = (kx1 -> 1xk) + (1xk -> kx1); a kxk receptive field at O(k)
    parameters (the reference's own GCN cannot construct — ours works)."""
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.models.layers import GCN

    gcn = GCN(features=8, kernel_size=7)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 16, 16, 4)), jnp.float32)
    v = gcn.init(jax.random.PRNGKey(0), x)
    y = gcn.apply(v, x)
    assert y.shape == (1, 16, 16, 8)
    # Parameter count is linear in k: 2 branches x (k*1*cin*co + 1*k*co*co)
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert n_params == 2 * (7 * 4 * 8 + 7 * 8 * 8) + 4 * 8  # + biases

    # Receptive field: a centered impulse reaches the (k//2, k//2) corner
    # through the composed branches, which a plain 1-D cross could not.
    imp = jnp.zeros((1, 16, 16, 4)).at[0, 8, 8, 0].set(1.0)
    out = gcn.apply(v, imp)
    reach = np.abs(np.asarray(out[0, :, :, 0])) > 1e-9
    assert reach[8 - 3, 8 - 3] and reach[8 + 3, 8 + 3]
    assert not reach[8 - 4, 8]  # nothing beyond k//2


def test_resnet_stage_remat_matches_plain():
    """MODEL.RESNETS.REMAT recomputes block activations in the backward;
    the loss must be bit-identical and gradients equal up to the recompute's
    bf16 matmul rounding."""
    from detectron2_tensorflow_tpu.models.backbones.resnet import ResNetStage

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 16, 8)), jnp.float32
    )
    results = {}
    for remat in (False, True):
        m = ResNetStage(
            num_blocks=2, out_channels=16, bottleneck_channels=4,
            norm="FrozenBN", remat=remat,
        )
        v = m.init(jax.random.PRNGKey(0), x, True)
        rest = {k: v[k] for k in v if k != "params"}

        def loss(params):
            return jnp.sum(m.apply({"params": params, **rest}, x, True) ** 2)

        l, g = jax.jit(jax.value_and_grad(loss))(v["params"])
        results[remat] = (float(l), g)
    assert results[False][0] == results[True][0]
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        results[False][1], results[True][1],
    )
    assert max(jax.tree.leaves(diffs)) < 5e-3
