"""Pallas ROI kernel correctness in interpret mode (runs on CPU)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.models.poolers import (
    multilevel_roi_align,
    plan_pooling,
)
from detectron2_tensorflow_tpu.ops.pallas.roi_patch import roi_patch_interpolate


def _boxes(rng, n=16, w=384, h=256):
    ctr = rng.uniform(40, 200, (n, 2))
    size = rng.uniform(10, 120, (n, 1)) * rng.uniform(0.8, 1.25, (n, 2))
    return np.clip(
        np.concatenate([ctr - size / 2, ctr + size / 2], 1), 0, [w, h, w, h]
    ).astype(np.float32)


@pytest.mark.slow
def test_pallas_kernel_matches_xla_path_interpret():
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((64 // 2**i, 96 // 2**i, 128)).astype(np.float32))
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    jb = jnp.asarray(_boxes(rng))

    for patch, tiers in ((56, False), (32, True)):
        want = multilevel_roi_align(
            feats, jb, strides, 7, 2, patch_size=patch, extent_tiers=tiers,
            use_pallas=False,
        )
        storage, starts, wy, wx = plan_pooling(
            feats, jb, strides, 7, 2, 224, 4, patch, tiers
        )
        got = roi_patch_interpolate(storage, starts, wy, wx, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
        )


def test_small_patch_with_tiers_matches_big_patch_for_fitting_boxes():
    """Boxes whose extent fits the patch bound at their area-rule level must
    pool IDENTICALLY under the tiered plan — only overflowing boxes are
    rerouted to the same level's averaged alias."""
    rng = np.random.default_rng(2)
    feats = [
        jnp.asarray(rng.standard_normal((64 // 2**i, 96 // 2**i, 64)).astype(np.float32))
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    boxes = _boxes(rng)
    # keep boxes whose extent at the area-rule level fits bound = 40-9 = 31
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lv = np.clip(np.floor(4 + np.log2(np.sqrt(areas) / 224 + 1e-8)), 2, 5)
    ext = np.maximum(boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]) / (
        2.0 ** lv
    )
    jb = jnp.asarray(boxes[ext <= 31])
    assert len(jb) >= 8

    big = multilevel_roi_align(feats, jb, strides, 7, 2, patch_size=56,
                               extent_tiers=False, use_pallas=False)
    small = multilevel_roi_align(feats, jb, strides, 7, 2, patch_size=40,
                                 extent_tiers=True, use_pallas=False)
    np.testing.assert_allclose(np.asarray(big), np.asarray(small),
                               atol=1e-5, rtol=1e-5)


def test_oversize_box_pools_from_averaged_level_not_truncated():
    """A box wider than (P-9)*top_stride must produce NONZERO pooled
    features everywhere (the old single-plane plan silently zeroed the
    out-of-patch region)."""
    rng = np.random.default_rng(3)
    feats = [
        jnp.asarray(
            rng.uniform(1.0, 2.0, (256 // 2**i, 384 // 2**i, 32)).astype(np.float32)
        )
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    # 1500-px-wide box at a 1536-px image: extent 47 cells at stride 32.
    box = jnp.asarray([[8.0, 100.0, 1508.0, 400.0]])
    out = multilevel_roi_align(feats, box, strides, 7, 2, patch_size=32,
                               extent_tiers=True, use_pallas=False)
    # all features are >= 1.0, so every pooled cell must be clearly nonzero
    assert float(np.asarray(out).min()) > 0.5, np.asarray(out).min()


def _manual_scatter(shape, starts, g, wy, wx, p):
    want = np.zeros(shape, np.float32)
    for i in range(len(g)):
        a = np.einsum("op,ouc->puc", np.asarray(wy[i]), np.asarray(g[i]))
        gp = np.einsum("uq,puc->pqc", np.asarray(wx[i]), a)
        row, tx = [int(v) for v in starts[i, :2]]
        want[row : row + p, tx : tx + p] += gp
    return want


@pytest.mark.slow
def test_pallas_backward_matches_manual_scatter_interpret():
    """Random ROIs: the grouped kernel's sort/deal reordering and padding
    must accumulate exactly (order-independence of the sum)."""
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        full_tier_class,
        roi_patch_backward,
    )

    rng = np.random.default_rng(1)
    n, s, p, c = 5, 7, 56, 128  # n NOT a multiple of BWD_GROUP: tests padding
    shape = (128, 64, c)  # row-concatenated plane
    g = jnp.asarray(rng.standard_normal((n, s, s, c)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    wx = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    # Dense random weights touch the whole patch: window class = full patch.
    full_cls = full_tier_class(p)
    rows = rng.integers(0, 128 - p + 1, n)
    txs = rng.integers(0, (64 - p) // 8 + 1, n) * 8
    starts = jnp.asarray(
        np.stack([rows, txs, np.full(n, full_cls)], 1), jnp.int32
    )
    got = roi_patch_backward(g, starts, wy, wx, out_shape=shape, interpret=True)
    want = _manual_scatter(shape, starts, g, wy, wx, p)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_pallas_backward_all_overlapping_rois_interpret():
    """Every ROI hits the SAME region — group members collide, the hazard
    flag must serialize the read-after-write chain exactly."""
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        full_tier_class,
        roi_patch_backward,
    )

    rng = np.random.default_rng(7)
    n, s, p, c = 8, 7, 32, 128
    shape = (64, 64, c)
    g = jnp.asarray(rng.standard_normal((n, s, s, c)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    wx = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    full_cls = full_tier_class(p)
    starts = jnp.asarray(
        np.stack([np.full(n, 8), np.full(n, 16), np.full(n, full_cls)], 1),
        jnp.int32,
    )
    got = roi_patch_backward(g, starts, wy, wx, out_shape=shape, interpret=True)
    want = _manual_scatter(shape, starts, g, wy, wx, p)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_pallas_backward_disjoint_rois_grouped_interpret():
    """Fully disjoint ROIs take the concurrent group path; each region must
    hold exactly its own gradient."""
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        full_tier_class,
        roi_patch_backward,
    )

    rng = np.random.default_rng(8)
    n, s, p, c = 8, 7, 32, 128
    shape = (320, 128, c)
    g = jnp.asarray(rng.standard_normal((n, s, s, c)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    wx = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    full_cls = full_tier_class(p)
    rows = np.arange(8) * 36  # pairwise row distance >= 36 > P: no overlap
    txs = np.array([0, 40, 80, 0, 40, 80, 0, 40])
    starts = jnp.asarray(
        np.stack([rows, txs, np.full(n, full_cls)], 1), jnp.int32
    )
    got = roi_patch_backward(g, starts, wy, wx, out_shape=shape, interpret=True)
    want = _manual_scatter(shape, starts, g, wy, wx, p)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-4)


def test_pooler_gradient_flows_through_storage():
    """d(pooled)/d(features) must reach every level through the
    concatenated storage (and the averaged extra level)."""
    rng = np.random.default_rng(4)
    feats = [
        jnp.asarray(rng.standard_normal((32 // 2**i, 48 // 2**i, 16)).astype(np.float32))
        for i in range(3)
    ]
    strides = [4, 8, 16]
    boxes = jnp.asarray(
        [[4.0, 4.0, 24.0, 24.0], [10.0, 10.0, 120.0, 110.0]], jnp.float32
    )

    def loss(fs):
        out = multilevel_roi_align(fs, boxes, strides, 7, 2, patch_size=24,
                                   extent_tiers=True, use_pallas=False)
        return jnp.sum(out**2)

    grads = jax.grad(loss)(feats)
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads)
    # the small box pools from level 0 -> its gradient is nonzero there
    assert float(jnp.abs(grads[0]).sum()) > 0


def test_avgpool2x_custom_vjp_matches_autodiff():
    """The hand-written 2x-avgpool transpose (broadcast/4) must equal XLA's
    autodiff of the same composite, including odd input sizes."""
    from detectron2_tensorflow_tpu.models.poolers import _avgpool2x

    def auto(f):
        s = jax.lax.reduce_window(
            f.astype(jnp.float32), 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1),
            "VALID",
        )
        return (s * 0.25).astype(f.dtype)

    rng = np.random.default_rng(0)
    for h, w in [(8, 12), (9, 13), (25, 42)]:
        f = jnp.asarray(rng.standard_normal((h, w, 16)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_avgpool2x(f)), np.asarray(auto(f)), rtol=1e-6
        )
        g_got = jax.grad(lambda x: jnp.sum(_avgpool2x(x) ** 2))(f)
        g_want = jax.grad(lambda x: jnp.sum(auto(x) ** 2))(f)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=1e-5
        )


@pytest.mark.slow
def test_batched_pool_matches_per_image_interpret():
    """The native-batch kernel path must equal per-image pooling."""
    from detectron2_tensorflow_tpu.models.poolers import (
        ROIPooler,
        pool_from_storage,
    )

    rng = np.random.default_rng(5)
    B = 3
    pooler = ROIPooler(7, [4, 8, 16, 32], 2, max_image_size=384)
    feats = [
        jnp.asarray(
            rng.standard_normal((B, 64 // 2**i, 96 // 2**i, 32)).astype(np.float32)
        )
        for i in range(4)
    ]
    boxes = jnp.asarray(np.stack([_boxes(rng, n=6) for _ in range(B)]))

    st, meta = jax.vmap(lambda pf: pooler.build_storage(pf)[0])(
        [f for f in feats]
    ), None
    # meta from a single-image build (identical layout across the batch)
    _, meta = pooler.build_storage([f[0] for f in feats])
    batched = pool_from_storage(st, meta, boxes, 7, 2, use_pallas=False)
    for b in range(B):
        single = pool_from_storage(st[b], meta, boxes[b], 7, 2, use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(single), atol=1e-5, rtol=1e-5
        )


@pytest.mark.slow
def test_batched_backward_matches_sum_of_single_interpret():
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        full_tier_class,
        roi_patch_backward,
    )

    rng = np.random.default_rng(9)
    B, n, s, p, c = 2, 6, 7, 32, 128
    shape = (96, 64, c)
    g = jnp.asarray(rng.standard_normal((B, n, s, s, c)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(0, 1, (B, n, s, p)).astype(np.float32))
    wx = jnp.asarray(rng.uniform(0, 1, (B, n, s, p)).astype(np.float32))
    full_cls = full_tier_class(p)
    rows = rng.integers(0, 96 - p, (B, n))
    txs = rng.integers(0, (64 - p) // 8 + 1, (B, n)) * 8
    starts = jnp.asarray(
        np.stack([rows, txs, np.full((B, n), full_cls)], -1), jnp.int32
    )
    got = roi_patch_backward(
        g, starts, wy, wx, out_shape=(B,) + shape, interpret=True
    )
    for b in range(B):
        want = _manual_scatter(shape, starts[b], g[b], wy[b], wx[b], p)
        np.testing.assert_allclose(
            np.asarray(got[b]), want, atol=1e-3, rtol=1e-4
        )


@pytest.mark.slow
def test_backward_with_narrowed_plan_classes_interpret():
    """Backward with REAL plan_rois window classes (narrow row/col tiers):
    every nonzero hat weight must fall inside the narrowed RMW window, so
    the kernel's tiered accumulation equals the full-patch manual scatter."""
    from detectron2_tensorflow_tpu.models.poolers import plan_pooling
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        roi_patch_backward,
        tier_combos,
    )

    rng = np.random.default_rng(11)
    feats = [
        jnp.asarray(rng.standard_normal((64 // 2**i, 96 // 2**i, 128)).astype(np.float32))
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    jb = jnp.asarray(_boxes(rng, n=24))
    storage, starts, wy, wx = plan_pooling(
        feats, jb, strides, 7, 2, 224, 4, 32, True
    )
    p = 32
    # the box set must actually exercise narrow tiers, not only full patch
    classes = set(np.asarray(starts)[:, 2].tolist())
    assert any(c != len(tier_combos(p)) - 1 for c in classes), classes
    # weights must be contained in the assigned window
    combos = tier_combos(p)
    swy, swx = np.asarray(wy), np.asarray(wx)
    for i, cl in enumerate(np.asarray(starts)[:, 2]):
        r, ct = combos[int(cl)]
        assert not np.abs(swy[i, :, r:]).any(), (i, cl, "row overflow")
        assert not np.abs(swx[i, :, ct:]).any(), (i, cl, "col overflow")
    g = jnp.asarray(
        rng.standard_normal((len(jb), 7, 7, 128)).astype(np.float32)
    )
    got = roi_patch_backward(
        g, starts, wy, wx, out_shape=storage.shape, interpret=True
    )
    want = _manual_scatter(storage.shape, starts, g, wy, wx, p)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-4)


def test_valid_skip_zeros_invalid_slots_and_preserves_valid():
    """Invalid slots (NMS padding) pool EXACT zeros and are skipped by the
    kernels (sentinel tier class = no DMA); valid slots are untouched. Both
    the Pallas (interpret) and XLA paths must agree."""
    from detectron2_tensorflow_tpu.models.poolers import (
        build_storage,
        plan_patch,
        pool_from_storage,
    )
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        roi_patch_interpolate,
        skip_tier_class,
    )
    from detectron2_tensorflow_tpu.models.poolers import plan_rois

    rng = np.random.default_rng(11)
    strides = [4, 8, 16, 32]
    feats = [
        jnp.asarray(rng.standard_normal((64 // 2**i, 96 // 2**i, 128)).astype(np.float32))
        for i in range(4)
    ]
    patch, tiers = plan_patch(384, 32)
    st, meta = build_storage(feats, strides, patch, tiers)
    n = 13  # not a group multiple: exercises sentinel pad dummies too
    boxes = jnp.asarray(_boxes(rng, n=n))
    valid = jnp.asarray(rng.random(n) > 0.4)
    v = np.asarray(valid)

    ref = pool_from_storage(st, meta, boxes, 7, 2, use_pallas=False)
    out = pool_from_storage(st, meta, boxes, 7, 2, use_pallas=False, valid=valid)
    np.testing.assert_array_equal(np.asarray(out)[~v], 0.0)
    np.testing.assert_allclose(np.asarray(out)[v], np.asarray(ref)[v])

    starts, wy, wx = plan_rois(meta, boxes, 7, 2, 224, 4, valid=valid)
    assert np.all(np.asarray(starts)[~v, 2] == skip_tier_class(patch))
    assert np.all(np.asarray(starts)[v, 2] < skip_tier_class(patch))
    got = roi_patch_interpolate(st, starts, wy, wx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[~v], 0.0)
    np.testing.assert_allclose(
        np.asarray(got)[v], np.asarray(ref)[v], atol=2e-4, rtol=1e-3
    )


def test_valid_skip_gradients_match_unskipped():
    """For a loss that masks invalid slots (as every consumer does), grads
    w.r.t. the storage must be IDENTICAL with and without the skip."""
    from detectron2_tensorflow_tpu.models.poolers import (
        build_storage,
        plan_patch,
        pool_from_storage,
    )

    rng = np.random.default_rng(12)
    strides = [4, 8, 16, 32]
    feats = [
        jnp.asarray(rng.standard_normal((64 // 2**i, 96 // 2**i, 128)).astype(np.float32))
        for i in range(4)
    ]
    patch, tiers = plan_patch(384, 32)
    st, meta = build_storage(feats, strides, patch, tiers)
    n = 10
    boxes = jnp.asarray(_boxes(rng, n=n))
    valid = jnp.asarray(rng.random(n) > 0.5)

    def loss(stor, valid_arg):
        o = pool_from_storage(stor, meta, boxes, 7, 2, use_pallas=False,
                              valid=valid_arg)
        return jnp.sum(jnp.where(valid[:, None, None, None], o, 0.0) ** 2)

    g_ref = jax.grad(lambda s: loss(s, None))(st)
    g_new = jax.grad(lambda s: loss(s, valid))(st)
    np.testing.assert_allclose(
        np.asarray(g_new), np.asarray(g_ref), atol=1e-5, rtol=1e-5
    )


def test_single_level_pooler_matches_exact_roi_align():
    """C4/DC5 path: ROIPooler on ONE level must reproduce the exact-XLA
    roi_align for boxes whose sample span fits the patch (the old
    fallback — removed because its vmapped gather materialized a
    [B, H*W, C] f32 temp, 6.1 GB at the C4 serving shape)."""
    from detectron2_tensorflow_tpu.models.poolers import ROIPooler
    from detectron2_tensorflow_tpu.ops.roi_align import roi_align

    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((25, 42, 16)).astype(np.float32))
    stride = 16
    # Spans well inside the planned patch at stride 16.
    boxes = jnp.asarray(
        [
            [10.0, 12.0, 200.0, 150.0],
            [0.0, 0.0, 60.0, 60.0],
            [300.0, 100.0, 640.0, 380.0],
        ],
        jnp.float32,
    )
    pooler = ROIPooler(
        7, [stride], sampling_ratio=2, max_image_size=672,
    )
    got = pooler([feat], boxes)
    want = roi_align(feat, boxes, 1.0 / stride, 7, 2, aligned=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_shard_map_wrap_matches_unwrapped_interpret():
    """With a multi-device mesh registered (parallel.set_active_mesh), the
    ROI kernels wrap their pallas_call in shard_map over 'data' — GSPMD
    cannot auto-partition Mosaic custom calls, so a bare kernel under a
    multi-chip jit fails to lower on real hardware (the CPU dryrun can't
    see this: Pallas routes to XLA paths off-TPU). Interpret mode exercises
    the shard_map plumbing on the virtual 8-CPU mesh."""
    import jax

    from detectron2_tensorflow_tpu import parallel
    from detectron2_tensorflow_tpu.models.poolers import plan_pooling

    rng = np.random.default_rng(5)
    feats = [
        jnp.asarray(
            rng.standard_normal((64 // 2**i, 96 // 2**i, 32)).astype(np.float32)
        )
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    jb = jnp.asarray(_boxes(rng, n=16))

    def batched(x, b=8):
        return jnp.broadcast_to(x[None], (b,) + x.shape)

    storage, starts, wy, wx = plan_pooling(
        feats, jb, strides, 7, 2, 224, 4, 32, True
    )
    args = tuple(batched(x) for x in (storage, starts, wy, wx))
    want = roi_patch_interpolate(*args, interpret=True)

    mesh = parallel.create_mesh(data_axis=8, model_axis=1)
    parallel.set_active_mesh(mesh)
    try:
        got = roi_patch_interpolate(*args, interpret=True)
    finally:
        parallel.set_active_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_shard_map_wrap_backward_matches_unwrapped_interpret():
    """Backward (RMW) kernel under the registered mesh: shard_map over
    'data' must reproduce the unwrapped accumulation exactly."""
    from detectron2_tensorflow_tpu import parallel
    from detectron2_tensorflow_tpu.models.poolers import plan_pooling
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        roi_patch_backward,
    )

    rng = np.random.default_rng(6)
    feats = [
        jnp.asarray(
            rng.standard_normal((64 // 2**i, 96 // 2**i, 32)).astype(np.float32)
        )
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    jb = jnp.asarray(_boxes(rng, n=8))
    storage, starts, wy, wx = plan_pooling(
        feats, jb, strides, 7, 2, 224, 4, 32, True
    )

    b = 8
    g = jnp.asarray(
        rng.standard_normal((b, starts.shape[0], 7, 7, 32)).astype(np.float32)
    )
    args = (
        g,
        jnp.broadcast_to(starts[None], (b,) + starts.shape),
        jnp.broadcast_to(wy[None], (b,) + wy.shape),
        jnp.broadcast_to(wx[None], (b,) + wx.shape),
    )
    out_shape = (b,) + storage.shape
    want = roi_patch_backward(*args, out_shape=out_shape, interpret=True)
    mesh = parallel.create_mesh(data_axis=8, model_axis=1)
    parallel.set_active_mesh(mesh)
    try:
        got = roi_patch_backward(*args, out_shape=out_shape, interpret=True)
    finally:
        parallel.set_active_mesh(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_adaptive_sampling_multilevel_matches_d2_oracle():
    """sampling_ratio=0 (D2's adaptive ceil rule) through the PRODUCTION
    tiered pooler: for boxes whose extent fits their area-rule level, the
    result must equal the literal-D2 oracle at that level — including the
    per-ROI, per-axis adaptive grid selection; and the Pallas kernel path
    (interpret) must match the XLA path bit-for-bit in plan terms."""
    from tests.test_roi_align import roi_align_reference

    rng = np.random.default_rng(11)
    feats = [
        jnp.asarray(
            rng.standard_normal((96 // 2**i, 128 // 2**i, 16)).astype(np.float32)
        )
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    # Box sizes spanning the area-rule levels; sides differ so the two
    # axes select DIFFERENT adaptive grids.
    boxes = np.array(
        [
            [8.0, 8.0, 72.0, 48.0],       # level 2, grids 3x2
            [10.0, 10.0, 130.0, 190.0],   # level 3, grids 3x4 (per-axis)
            [0.0, 0.0, 350.0, 300.0],     # level 4, in patch bound
            [40.0, 30.0, 44.0, 34.0],     # tiny: grid 1x1
            [5.0, 5.0, 5.0, 60.0],        # degenerate width -> zeros
        ],
        np.float32,
    )
    out = np.asarray(
        multilevel_roi_align(
            feats, jnp.asarray(boxes), strides, 7, sampling_ratio=0,
            patch_size=32, extent_tiers=True, use_pallas=False,
        )
    )
    # Oracle: pure FPN area rule (these boxes never overflow the patch
    # bound, so no alias rerouting happens).
    areas = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    lvl = np.clip(
        np.floor(4 + np.log2(np.sqrt(areas) / 224 + 1e-8)), 2, 5
    ).astype(int) - 2
    for i, box in enumerate(boxes):
        want = roi_align_reference(
            np.asarray(feats[lvl[i]]), box[None], 1.0 / strides[lvl[i]], 7, 0
        )[0]
        np.testing.assert_allclose(out[i], want, atol=2e-5, rtol=1e-4)
    assert np.all(out[4] == 0.0)

    # Pallas (interpret) path agrees with the XLA path under adaptive plans.
    storage, starts, wy, wx = plan_pooling(
        feats, jnp.asarray(boxes), strides, 7, 0, 224, 4, 32, True
    )
    got = roi_patch_interpolate(storage, starts, wy, wx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), out, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_pool_multi_fused_backward_matches_independent_interpret():
    """roi_patch_pool_multi (box 7x7 + mask 14x14 sets sharing one storage
    plane): forward must equal independent pools; the CHAINED backward
    (one accumulator plane, init= threading) must equal the sum of the
    independent sets' storage gradients."""
    from detectron2_tensorflow_tpu.models.poolers import (
        ROIPooler,
        plan_rois,
        pool_from_storage,
    )
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import (
        roi_patch_pool_multi,
    )

    rng = np.random.default_rng(21)
    B = 2
    pooler_box = ROIPooler(7, [4, 8, 16, 32], 0, max_image_size=384)
    pooler_mask = ROIPooler(14, [4, 8, 16, 32], 0, max_image_size=384)
    feats = [
        jnp.asarray(
            rng.standard_normal((B, 64 // 2**i, 96 // 2**i, 32)).astype(np.float32)
        )
        for i in range(4)
    ]
    boxes_a = jnp.asarray(np.stack([_boxes(rng, n=8) for _ in range(B)]))
    boxes_b = jnp.asarray(np.stack([_boxes(rng, n=5) for _ in range(B)]))
    valid_a = jnp.asarray(rng.uniform(size=(B, 8)) > 0.25)

    storage, meta = jax.vmap(
        lambda *pf: pooler_box.build_storage(list(pf))[0]
    )(*feats), pooler_box.build_storage([f[0] for f in feats])[1]

    import functools as _ft

    def specs_for(pooler, bx, valid=None):
        plan = _ft.partial(
            plan_rois, meta, output_size=pooler.output_size,
            sampling_ratio=pooler.sampling_ratio,
            canonical_box_size=pooler.canonical_box_size,
            canonical_level=pooler.canonical_level,
        )
        if valid is None:
            return jax.vmap(plan)(bx)
        return jax.vmap(lambda b, v: plan(b, valid=v))(bx, valid)

    spec_a = specs_for(pooler_box, boxes_a, valid_a)
    spec_b = specs_for(pooler_mask, boxes_b)

    got_a, got_b = roi_patch_pool_multi(storage, (spec_a, spec_b), True)
    want_a = pool_from_storage(
        storage, meta, boxes_a, 7, 0, use_pallas=False, valid=valid_a
    )
    want_b = pool_from_storage(storage, meta, boxes_b, 14, 0, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(got_a), np.asarray(want_a), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_b), np.asarray(want_b), atol=2e-4, rtol=1e-3
    )

    # Fused backward: one accumulator plane == sum of independent grads.
    ga = jnp.asarray(rng.standard_normal(want_a.shape).astype(np.float32))
    gb = jnp.asarray(rng.standard_normal(want_b.shape).astype(np.float32))

    def loss_multi(st):
        a, b = roi_patch_pool_multi(st, (spec_a, spec_b), True)
        return jnp.sum(a * ga) + jnp.sum(b * gb)

    def loss_indep(st):
        a = pool_from_storage(
            st, meta, boxes_a, 7, 0, use_pallas=False, valid=valid_a
        )
        b = pool_from_storage(st, meta, boxes_b, 14, 0, use_pallas=False)
        return jnp.sum(a * ga) + jnp.sum(b * gb)

    grad_multi = jax.grad(loss_multi)(storage)
    grad_indep = jax.grad(loss_indep)(storage)
    np.testing.assert_allclose(
        np.asarray(grad_multi), np.asarray(grad_indep), atol=2e-3, rtol=1e-3
    )


def test_pool_multi_from_storage_xla_fallback_matches_independent():
    """The poolers-level entry point on the XLA path (CPU) must equal
    independent pool_from_storage calls exactly."""
    from detectron2_tensorflow_tpu.models.poolers import (
        ROIPooler,
        pool_from_storage,
        pool_multi_from_storage,
    )

    rng = np.random.default_rng(23)
    B = 2
    pooler = ROIPooler(7, [4, 8, 16, 32], 2, max_image_size=384)
    feats = [
        jnp.asarray(
            rng.standard_normal((B, 64 // 2**i, 96 // 2**i, 16)).astype(np.float32)
        )
        for i in range(4)
    ]
    boxes_a = jnp.asarray(np.stack([_boxes(rng, n=6) for _ in range(B)]))
    boxes_b = jnp.asarray(np.stack([_boxes(rng, n=4) for _ in range(B)]))
    storage = jax.vmap(lambda *pf: pooler.build_storage(list(pf))[0])(*feats)
    meta = pooler.build_storage([f[0] for f in feats])[1]

    outs = pool_multi_from_storage(
        storage, meta,
        [
            dict(boxes=boxes_a, output_size=7, sampling_ratio=2),
            dict(boxes=boxes_b, output_size=14, sampling_ratio=2),
        ],
    )
    want_a = pool_from_storage(storage, meta, boxes_a, 7, 2, use_pallas=False)
    want_b = pool_from_storage(storage, meta, boxes_b, 14, 2, use_pallas=False)
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(want_a))
    np.testing.assert_allclose(np.asarray(outs[1]), np.asarray(want_b))
