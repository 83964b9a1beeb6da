"""Pallas ROI kernel correctness in interpret mode (runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.models.poolers import (
    DEFAULT_PATCH,
    _interp_weights,
    assign_boxes_to_levels,
    multilevel_roi_align,
)
from detectron2_tensorflow_tpu.ops.pallas.roi_patch import roi_patch_interpolate


def test_pallas_kernel_matches_xla_path_interpret():
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((64 // 2**i, 96 // 2**i, 128)).astype(np.float32))
        for i in range(4)
    ]
    strides = [4, 8, 16, 32]
    ctr = rng.uniform(40, 200, (16, 2))
    size = rng.uniform(10, 120, (16, 1)) * rng.uniform(0.8, 1.25, (16, 2))
    boxes = np.clip(
        np.concatenate([ctr - size / 2, ctr + size / 2], 1), 0, [384, 256, 384, 256]
    ).astype(np.float32)
    jb = jnp.asarray(boxes)

    want = multilevel_roi_align(feats, jb, strides, 7, 2, use_pallas=False)

    # Rebuild the kernel inputs exactly as multilevel_roi_align does.
    p = DEFAULT_PATCH
    h_max = max(max(f.shape[0] for f in feats), p)
    w_max = max(max(f.shape[1] for f in feats), p)
    stacked = jnp.stack(
        [
            jnp.pad(f, ((0, h_max - f.shape[0]), (0, w_max - f.shape[1]), (0, 0)))
            for f in feats
        ]
    )
    levels = assign_boxes_to_levels(jb, 2, 5, patch_size=p)
    scales = jnp.take(jnp.asarray([1 / s for s in strides], jnp.float32), levels)
    h_l = jnp.take(jnp.asarray([f.shape[0] for f in feats], jnp.float32), levels)
    w_l = jnp.take(jnp.asarray([f.shape[1] for f in feats], jnp.float32), levels)
    scaled = jb * scales[:, None]
    s = 14
    steps = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = (scaled[:, 1] - 0.5)[:, None] + steps[None] * (scaled[:, 3] - scaled[:, 1])[:, None]
    xs = (scaled[:, 0] - 0.5)[:, None] + steps[None] * (scaled[:, 2] - scaled[:, 0])[:, None]
    ty = jnp.clip(jnp.floor(jnp.clip(ys[:, 0], 0.0, None)), 0.0, h_max - p)
    tx = jnp.clip(jnp.floor(jnp.clip(xs[:, 0], 0.0, None)), 0.0, w_max - p)
    tx = jnp.floor(tx / 8) * 8
    wy = _interp_weights(ys, ty, h_l, p, 7, 2)
    wx = _interp_weights(xs, tx, w_l, p, 7, 2)
    starts = jnp.stack([levels, ty.astype(jnp.int32), tx.astype(jnp.int32)], 1)

    got = roi_patch_interpolate(stacked, starts, wy, wx, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3
    )


def test_pallas_backward_matches_manual_scatter_interpret():
    from detectron2_tensorflow_tpu.ops.pallas.roi_patch import roi_patch_backward

    rng = np.random.default_rng(1)
    n, s, p, c = 5, 7, 56, 128
    shape = (2, 64, 64, c)
    g = jnp.asarray(rng.standard_normal((n, s, s, c)).astype(np.float32))
    wy = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    wx = jnp.asarray(rng.uniform(0, 1, (n, s, p)).astype(np.float32))
    starts = jnp.asarray(
        np.stack(
            [
                rng.integers(0, 2, n),
                rng.integers(0, 64 - p + 1, n),
                rng.integers(0, (64 - p) // 8 + 1, n) * 8,
            ],
            axis=1,
        ),
        jnp.int32,
    )
    got = roi_patch_backward(g, starts, wy, wx, out_shape=shape, interpret=True)

    want = np.zeros(shape, np.float32)
    for i in range(n):
        a = np.einsum("op,ouc->puc", np.asarray(wy[i]), np.asarray(g[i]))
        gp = np.einsum("uq,puc->pqc", np.asarray(wx[i]), a)
        l, ty, tx = [int(v) for v in starts[i]]
        want[l, ty : ty + p, tx : tx + p] += gp
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3, rtol=1e-4)
