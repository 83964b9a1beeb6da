"""Fused bottleneck epilogue (conv1x1+FrozenBN+add+relu) correctness.

The Pallas kernel runs in interpret mode here (CPU CI); the real-chip
equivalence is covered by the bench/profile runs and the golden values are
the unfused XLA composition itself.

The fused path is OPT-IN (measured net regression at the serving shape —
see ops/pallas/fused_residual.py); these tests force it on so the kernel
and its Conv2D wiring stay correct while parked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _enable_fused(monkeypatch):
    monkeypatch.setenv("D2TPU_ENABLE_FUSED_EPILOGUE", "1")

from detectron2_tensorflow_tpu.ops.pallas.fused_residual import (
    _launch,
    _reference,
    fused_conv1x1_bn_add_relu,
)


def _inputs(b=2, h=5, w=7, k=64, n=256, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, k), dtype)
    kernel = jnp.asarray(rng.randn(1, 1, k, n) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(n) * 0.2, jnp.float32)
    sc = jnp.asarray(rng.randn(b, h, w, n), dtype)
    return x, kernel, scale, shift, sc


def test_interpret_kernel_matches_reference():
    # b*h*w = 70: deliberately NOT a multiple of the row tile, so the
    # masked edge block is exercised.
    x, kernel, scale, shift, sc = _inputs()
    w2d = kernel.reshape(kernel.shape[-2], kernel.shape[-1]).astype(x.dtype)
    ss = jnp.stack([scale, shift]).astype(jnp.float32)
    got = _launch(x, w2d, ss, sc, interpret=True)
    want = _reference(x, kernel, scale, shift, sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert got.dtype == x.dtype


def test_interpret_kernel_bf16():
    x, kernel, scale, shift, sc = _inputs(dtype=jnp.bfloat16)
    w2d = kernel.reshape(kernel.shape[-2], kernel.shape[-1]).astype(x.dtype)
    ss = jnp.stack([scale, shift]).astype(jnp.float32)
    got = _launch(x, w2d, ss, sc, interpret=True).astype(jnp.float32)
    want = _reference(x, kernel, scale, shift, sc).astype(jnp.float32)
    # The fused kernel rounds once (f32 epilogue); the reference rounds at
    # every step — bf16-scale tolerance.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.05)


def test_custom_vjp_matches_autodiff():
    x, kernel, scale, shift, sc = _inputs(b=1, h=4, w=4, k=32, n=64)

    def loss_fused(args):
        out = fused_conv1x1_bn_add_relu(*args)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(args):
        out = _reference(*args)
        return jnp.sum(out * jnp.cos(out))

    args = (x, kernel, scale, shift, sc)
    g_fused = jax.grad(loss_fused)(args)
    g_ref = jax.grad(loss_ref)(args)
    for a, b, name in zip(g_fused, g_ref,
                          ["dx", "dw", "dscale", "dshift", "dsc"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4,
            err_msg=name,
        )


def test_conv2d_residual_param_tree_unchanged():
    """Conv2D must declare the identical variable tree with and without the
    fused residual path, so converters/checkpoints are oblivious."""
    from detectron2_tensorflow_tpu.models.layers import Conv2D

    x = jnp.zeros((1, 4, 4, 16))
    sc = jnp.zeros((1, 4, 4, 32))
    plain = Conv2D(32, 1, norm="FrozenBN", name="conv3").init(
        jax.random.PRNGKey(0), x
    )
    fused = Conv2D(32, 1, norm="FrozenBN", name="conv3").init(
        jax.random.PRNGKey(0), x, residual=sc
    )
    paths = lambda v: set(
        jax.tree_util.tree_map_with_path(lambda p, _: None, v) and
        [jax.tree_util.keystr(p)
         for p, _ in jax.tree_util.tree_flatten_with_path(v)[0]]
    )
    assert paths(plain) == paths(fused)


def test_conv2d_residual_semantics_fallback():
    """A non-fusable shape (3x3) with residual still computes
    relu(norm(conv(x)) + residual)."""
    from detectron2_tensorflow_tpu.models.layers import Conv2D

    x = jnp.asarray(np.random.RandomState(1).randn(1, 6, 6, 8), jnp.float32)
    sc = jnp.asarray(np.random.RandomState(2).randn(1, 6, 6, 8), jnp.float32)
    m = Conv2D(8, 3, norm="FrozenBN")
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x, residual=sc)
    base = m.apply(v, x)  # conv+norm, no activation
    np.testing.assert_allclose(
        np.asarray(got), np.maximum(np.asarray(base + sc), 0.0), atol=1e-6
    )


@pytest.mark.parametrize("deform", [False])
def test_bottleneck_block_matches_manual(deform):
    """BottleneckBlock with the fused tail equals the hand-composed
    conv3->FrozenBN->add->relu (CPU: the op routes to the XLA reference)."""
    from detectron2_tensorflow_tpu.models.backbones.resnet import (
        BottleneckBlock,
    )
    from detectron2_tensorflow_tpu.models.layers import Conv2D

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
    m = BottleneckBlock(out_channels=32, bottleneck_channels=8,
                        has_shortcut=True, deform=deform)
    v = m.init(jax.random.PRNGKey(0), x)
    # Randomize the frozen BN stats so the folded affine is non-trivial.
    v = jax.tree_util.tree_map_with_path(
        lambda p, a: (
            jnp.asarray(rng.rand(*a.shape) + 0.5, a.dtype)
            if "frozen" in jax.tree_util.keystr(p)
            else a
        ),
        dict(v),
    )
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 32)
    assert np.all(np.asarray(out) >= 0)

    # Hand-composed tail: run conv1/conv2/shortcut as standalone Conv2Ds on
    # their subtrees, then conv3's matmul + folded FrozenBN affine + add +
    # relu explicitly; must equal the block output (which takes the fused
    # custom_vjp path).
    def sub(name):
        return {coll: tree[name] for coll, tree in v.items()}

    h = Conv2D(8, 1, norm="FrozenBN", activation="relu").apply(sub("conv1"), x)
    h = Conv2D(8, 3, norm="FrozenBN", activation="relu").apply(sub("conv2"), h)
    sc = Conv2D(32, 1, norm="FrozenBN").apply(sub("shortcut"), x)
    w3 = v["params"]["conv3"]["conv"]["kernel"][0, 0]  # [K, N]
    f3 = v["frozen"]["conv3"]["FrozenBatchNorm_0"]
    scale = f3["scale"] / jnp.sqrt(f3["var"] + 1e-5)
    shift = f3["bias"] - f3["mean"] * scale
    manual = jax.nn.relu(jnp.einsum("bhwk,kn->bhwn", h, w3) * scale + shift + sc)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(manual), atol=1e-5, rtol=1e-5
    )

    # conv3 kernel participates in grads through the fused custom_vjp
    def loss(params):
        return jnp.sum(m.apply({"params": params, "frozen": v["frozen"]}, x))
    g = jax.grad(loss)(v["params"])
    assert float(jnp.abs(g["conv3"]["conv"]["kernel"]).sum()) > 0


def test_explicit_padding_conv_takes_unfused_path():
    """A 1x1 conv with explicit numeric padding must NOT ride the fused
    epilogue (which would silently drop the padding); the unfused path
    then fails loudly on the residual shape mismatch."""
    from detectron2_tensorflow_tpu.ops.pallas.fused_residual import (
        fused_epilogue_supported,
    )

    assert not fused_epilogue_supported(
        1, 1, 1, 1, "FrozenBN", False, padding=[(1, 1), (1, 1)]
    )
    assert fused_epilogue_supported(1, 1, 1, 1, "FrozenBN", False, "SAME")
    assert fused_epilogue_supported(1, 1, 1, 1, "FrozenBN", False, "VALID")


def test_dot_tail_formulation_matches_unfused(monkeypatch):
    """D2TPU_DOT_TAIL=1 re-expresses the bottleneck tail's 1x1 conv as a
    plain-XLA dot_general (channel-axis contraction) so the affine+add+relu
    can output-fuse into the matmul (convolutions never admit that fusion —
    see ops/pallas/fused_residual.py). Same params, bit-identical result."""
    import numpy as np

    from detectron2_tensorflow_tpu.models.layers import Conv2D

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16), jnp.bfloat16)
    r = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 32), jnp.bfloat16)
    m = Conv2D(features=32, kernel_size=1, strides=1, norm="FrozenBN",
               dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x, residual=r)
    # Non-trivial frozen stats so the affine actually does something.
    v = dict(v)
    v["frozen"] = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            np.random.RandomState(2).rand(*a.shape) + 0.5, a.dtype
        ),
        v["frozen"],
    )
    monkeypatch.delenv("D2TPU_DOT_TAIL", raising=False)
    y0 = m.apply(v, x, residual=r)
    monkeypatch.setenv("D2TPU_DOT_TAIL", "1")
    y1 = m.apply(v, x, residual=r)
    np.testing.assert_array_equal(
        np.asarray(y0, np.float32), np.asarray(y1, np.float32)
    )
