"""Fast layer-variant exactness tests (no model builds)."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.models.layers import (
    max_pool,
    max_pool_3x3_s2_separable,
)


def test_separable_stem_maxpool_exact():
    """3x1+1x3 two-pass maxpool == fused 3x3/2 maxpool with symmetric
    padding, bit-exact (max separates over window axes)."""
    rng = np.random.default_rng(0)
    for h, w in [(64, 128), (50, 70), (7, 9)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
        want = max_pool(x, 3, 2)  # env off by default -> fused path
        got = max_pool_3x3_s2_separable(x)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
