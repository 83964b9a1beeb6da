import jax
import jax.numpy as jnp
import numpy as np

from detectron2_tensorflow_tpu.models.deform_conv import DeformConv2D


def test_zero_offset_equals_plain_conv():
    """With zero offsets (the init state), deformable conv must equal a
    standard 3x3 conv with the same kernel."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 9, 11, 6)).astype(np.float32))
    m = DeformConv2D(features=4, kernel_size=3)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)

    kernel = variables["params"]["kernel"]  # [3, 3, 6, 4]
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_modulated_zero_offset_is_half_conv():
    """v2 at init: offsets zero, modulation sigmoid(0)=0.5 -> conv * 0.5."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    m = DeformConv2D(features=3, kernel_size=3, modulated=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    kernel = variables["params"]["kernel"]
    want = 0.5 * jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4)


def test_strided_deform_shape():
    x = jnp.zeros((2, 16, 16, 8))
    m = DeformConv2D(features=8, kernel_size=3, strides=2, deform_groups=2)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 8, 8, 8)


def test_resnet_with_deform_stage():
    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.models.backbones.resnet import (
        build_resnet_backbone,
    )

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3"]
    cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, True, False, False]
    cfg.MODEL.RESNETS.DEFORM_MODULATED = True
    module, shapes = build_resnet_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    # deform conv2 exists in res3 blocks
    assert "conv_offset" in variables["params"]["res3"]["0"]["conv2"]
    out = jax.jit(lambda v, x: module.apply(v, x))(variables, x)
    assert out["res3"].shape == (1, 8, 8, 512)


def test_batched_equals_per_image_with_real_offsets():
    """The folded-batch gather (row_base into one [B*H*W, C] plane) must
    keep images isolated: a batch-2 forward equals two batch-1 forwards,
    with REAL nonzero offsets including samples pushed out of bounds."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 6)).astype(np.float32))
    m = DeformConv2D(features=5, kernel_size=3, modulated=True)
    variables = m.init(jax.random.PRNGKey(0), x)
    # Non-trivial offset field: random kernel + a bias large enough to push
    # some taps outside the map (zero-pad semantics must hold per image).
    p = variables["params"]
    ok = p["conv_offset"]["kernel"]
    p = jax.tree_util.tree_map(lambda a: a, p)
    p["conv_offset"]["kernel"] = jnp.asarray(
        rng.standard_normal(ok.shape).astype(np.float32) * 0.5
    )
    p["conv_offset"]["bias"] = jnp.asarray(
        rng.uniform(-4, 4, p["conv_offset"]["bias"].shape).astype(np.float32)
    )
    variables = {"params": p}
    full = m.apply(variables, x)
    one0 = m.apply(variables, x[:1])
    one1 = m.apply(variables, x[1:])
    np.testing.assert_allclose(np.asarray(full[0]), np.asarray(one0[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(full[1]), np.asarray(one1[0]), atol=1e-4)
    assert np.isfinite(np.asarray(full)).all()

    # Gradients flow through offsets, modulation, and the kernel.
    def loss(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(p)
    assert float(jnp.abs(g["conv_offset"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["kernel"]).sum()) > 0


def test_bf16_drift_vs_f32_is_bounded():
    """Production runs dtype=bf16, where the 4 corner taps and modulation
    multiply-accumulate in bf16 before the f32 matmul. Bound that drift
    against the f32 path at a realistic activation scale: bf16 carries
    ~3 decimal digits, so with unit-scale inputs the sampled taps (and
    hence the output, whose matmul accumulates in f32) should agree with
    f32 to ~1e-1 absolute worst-case and far tighter in the mean."""
    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.standard_normal((2, 12, 14, 8)).astype(np.float32))
    m32 = DeformConv2D(features=8, kernel_size=3, modulated=True)
    m16 = DeformConv2D(
        features=8, kernel_size=3, modulated=True, dtype=jnp.bfloat16
    )
    variables = m32.init(jax.random.PRNGKey(0), x32)
    p = variables["params"]
    ok = p["conv_offset"]["kernel"]
    p["conv_offset"]["kernel"] = jnp.asarray(
        rng.standard_normal(ok.shape).astype(np.float32) * 0.3
    )
    p["conv_offset"]["bias"] = jnp.asarray(
        rng.uniform(-2, 2, p["conv_offset"]["bias"].shape).astype(np.float32)
    )
    variables = {"params": p}
    out32 = np.asarray(m32.apply(variables, x32), dtype=np.float32)
    out16 = np.asarray(
        m16.apply(variables, x32.astype(jnp.bfloat16)), dtype=np.float32
    )
    err = np.abs(out16 - out32)
    scale = np.abs(out32).mean() + 1e-6
    assert err.max() / scale < 0.35, (err.max(), scale)
    assert err.mean() / scale < 0.02, (err.mean(), scale)
