import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.convert.d2 import apply_converted, convert_d2_weights
from detectron2_tensorflow_tpu.models import build_model


def synth_d2_maskrcnn_r50_fpn_state(rng):
    """Random arrays under the exact Detectron2 checkpoint names for
    mask_rcnn_R_50_FPN (the converter's parity target)."""
    sd = {}

    def conv(name, cin, cout, k, frozen_bn=True, bias=False):
        sd[name + ".weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.standard_normal(cout).astype(np.float32)
        if frozen_bn:
            sd[name + ".norm.weight"] = rng.standard_normal(cout).astype(np.float32)
            sd[name + ".norm.bias"] = rng.standard_normal(cout).astype(np.float32)
            sd[name + ".norm.running_mean"] = rng.standard_normal(cout).astype(np.float32)
            sd[name + ".norm.running_var"] = rng.uniform(0.5, 2, cout).astype(np.float32)

    def fc(name, cin, cout):
        sd[name + ".weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(cout).astype(np.float32)

    conv("backbone.bottom_up.stem.conv1", 3, 64, 7)
    blocks = [3, 4, 6, 3]
    cin_stage = 64
    for g, nb in enumerate(blocks):
        cmid = 64 * 2**g
        cout = 256 * 2**g
        for b in range(nb):
            p = f"backbone.bottom_up.res{g + 2}.{b}"
            conv(p + ".conv1", cin_stage if b == 0 else cout, cmid, 1)
            conv(p + ".conv2", cmid, cmid, 3)
            conv(p + ".conv3", cmid, cout, 1)
            if b == 0:
                conv(p + ".shortcut", cin_stage, cout, 1)
        cin_stage = cout
    for lvl, cin in zip(range(2, 6), [256, 512, 1024, 2048]):
        conv(f"backbone.fpn_lateral{lvl}", cin, 256, 1, frozen_bn=False, bias=True)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3, frozen_bn=False, bias=True)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3, frozen_bn=False, bias=True)
    conv("proposal_generator.rpn_head.objectness_logits", 256, 3, 1, frozen_bn=False, bias=True)
    conv("proposal_generator.rpn_head.anchor_deltas", 256, 12, 1, frozen_bn=False, bias=True)
    fc("roi_heads.box_head.fc1", 256 * 7 * 7, 1024)
    fc("roi_heads.box_head.fc2", 1024, 1024)
    fc("roi_heads.box_predictor.cls_score", 1024, 81)
    fc("roi_heads.box_predictor.bbox_pred", 1024, 320)
    for i in range(4):
        conv(f"roi_heads.mask_head.mask_fcn{i + 1}", 256, 256, 3, frozen_bn=False, bias=True)
    sd["roi_heads.mask_head.deconv.weight"] = rng.standard_normal((256, 256, 2, 2)).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = rng.standard_normal(256).astype(np.float32)
    conv("roi_heads.mask_head.predictor", 256, 80, 1, frozen_bn=False, bias=True)
    return sd


def maskrcnn_cfg():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/reference/configs/COCO-InstanceSegmentation/mask_rcnn_R_50_FPN_1x.yaml"
    )
    cfg.MODEL.RESNETS.DEPTH = 50
    return cfg


@pytest.mark.slow
def test_convert_covers_every_model_param():
    rng = np.random.default_rng(0)
    sd = synth_d2_maskrcnn_r50_fpn_state(rng)
    cfg = maskrcnn_cfg()
    converted, leftovers = convert_d2_weights(sd, cfg)
    assert leftovers == [], leftovers

    model = build_model(cfg)
    batch = {"image": jnp.zeros((1, 64, 64, 3)), "image_size": jnp.array([[64, 64]])}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    merged = apply_converted(variables, converted)

    # Every converted leaf must have landed (merge raises on missing), and
    # every model param must differ from its random init (i.e. was covered).
    changed = jax.tree.map(
        lambda a, b: bool(jnp.any(a != b)) or a.size == 0,
        variables["params"],
        merged["params"],
    )
    uncovered = [
        jax.tree_util.keystr(p)
        for p, v in jax.tree_util.tree_flatten_with_path(changed)[0]
        if not v
    ]
    assert uncovered == [], uncovered


def test_convert_conv_frozen_bn_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from detectron2_tensorflow_tpu.models.layers import Conv2D

    rng = np.random.default_rng(1)
    sd = {}
    cout, cin = 8, 5
    sd["m.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    sd["m.norm.weight"] = rng.standard_normal(cout).astype(np.float32)
    sd["m.norm.bias"] = rng.standard_normal(cout).astype(np.float32)
    sd["m.norm.running_mean"] = rng.standard_normal(cout).astype(np.float32)
    sd["m.norm.running_var"] = rng.uniform(0.5, 2, cout).astype(np.float32)

    x = rng.standard_normal((1, 9, 9, cin)).astype(np.float32)
    with torch.no_grad():
        t = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(sd["m.weight"]), padding=1)
        t = F.batch_norm(
            t,
            torch.tensor(sd["m.norm.running_mean"]),
            torch.tensor(sd["m.norm.running_var"]),
            torch.tensor(sd["m.norm.weight"]),
            torch.tensor(sd["m.norm.bias"]),
            eps=1e-5,
        )
    want = t.numpy().transpose(0, 2, 3, 1)

    from detectron2_tensorflow_tpu.convert.d2 import _TreeWriter

    w = _TreeWriter()
    w.conv(dict(sd), "m", ["m"])
    module = Conv2D(cout, 3, norm="FrozenBN")
    # Standalone apply: the root module's own name isn't part of the scope.
    variables = {"params": w.params["m"], "frozen": w.frozen["m"]}
    got = np.asarray(module.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_convert_fc1_relayout_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(2)
    c, r = 16, 7
    pooled = rng.standard_normal((2, r, r, c)).astype(np.float32)  # NHWC (ours)
    w_t = rng.standard_normal((32, c * r * r)).astype(np.float32)
    b_t = rng.standard_normal(32).astype(np.float32)
    with torch.no_grad():
        want = (
            torch.tensor(pooled.transpose(0, 3, 1, 2)).flatten(1) @ torch.tensor(w_t).T
            + torch.tensor(b_t)
        ).numpy()

    from detectron2_tensorflow_tpu.convert.d2 import _TreeWriter

    wtr = _TreeWriter()
    wtr.fc({"fc1.weight": w_t, "fc1.bias": b_t}, "fc1", ["fc1"], pooled_shape=(c, r, r))
    kernel = wtr.params["fc1"]["kernel"]
    got = pooled.reshape(2, -1) @ kernel + b_t
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_convert_deconv_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from detectron2_tensorflow_tpu.models.layers import ConvTranspose2D

    rng = np.random.default_rng(3)
    w_t = rng.standard_normal((6, 4, 2, 2)).astype(np.float32)
    b_t = rng.standard_normal(4).astype(np.float32)
    x = rng.standard_normal((1, 5, 5, 6)).astype(np.float32)
    with torch.no_grad():
        want = (
            F.conv_transpose2d(
                torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(w_t),
                torch.tensor(b_t), stride=2,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    from detectron2_tensorflow_tpu.convert.d2 import _TreeWriter

    wtr = _TreeWriter()
    wtr.deconv({"d.weight": w_t, "d.bias": b_t}, "d", ["d"])
    module = ConvTranspose2D(4, 2, 2)
    got = np.asarray(module.apply({"params": wtr.params["d"]}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
