"""Numeric (not structural) converter proofs for the SOLOv2 and darknet
importers — VERDICT r3 #5.

Each test transcribes the FOREIGN framework's forward math in torch using
the EXACT foreign checkpoint naming (mmdet ``bbox_head.cate_convs.{i}.conv``
/ darknet's binary bias→[gamma,mean,var]→OIHW order), feeds the same random
weights through both the torch transcription and the converted JAX model,
and asserts the outputs agree numerically — the test_convert_d2 pattern
extended to the two families that previously had only shape contracts.

Reference converters: /root/reference/lib/convert_models/convert_solo.py,
convert_yolov4.py. mmdet forward contract: SOLOv2Head.forward_single
(coord-concat -> grid resize -> kernel tower / cate tower on [:, :-2]) and
MaskFeatHead (per-level conv[+2x bilinear up] chains, summed, conv_pred).
The grid resize is run at identity size (feature == grid) so resize-kernel
conventions cannot mask a weight-routing error — what is under test is the
CONVERTER's layout math, not interpolation flavors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.convert.solo import convert_solo_weights

from test_convert_solo import synth_mmdet_solov2_state


def small_solo_cfg():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/COCO-InstanceSegmentation/solo_v2_R_50_FPN_1x.yaml"
    )
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 4
    s = cfg.MODEL.SOLO
    s.MASK_KERNEL_NUM_CONVS = 2
    s.MASK_KERNEL_CONVS_DIM = 64
    s.MASK_FEATURE_CONVS_DIM = 32
    s.MASK_FEATURE_OUT_DIMS = 32
    s.MASK_KERNEL_SIZE = 1
    # Identity grid resize: feature sizes at a 64x64 input are
    # p2..p6 = 16/8/4/2/1.
    s.NUM_GRIDS = [16, 8, 4, 2, 1]
    return cfg


def torch_mmdet_solov2_forward(sd, feats_nchw, cfg):
    """mmdet SOLOv2 head + mask-feat forward transcribed with torch
    functionals, reading weights straight from the mmdet-named state dict
    (so a mis-routed tensor in the converter shows up as a numeric diff).
    ConvModule = conv(pad k//2, no bias) -> GN(32, eps 1e-5) -> relu."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
    s = cfg.MODEL.SOLO

    def convmod(x, base):
        w = t[base + ".conv.weight"]
        x = F.conv2d(x, w, None, padding=w.shape[-1] // 2)
        x = F.group_norm(
            x, 32, t[base + ".gn.weight"], t[base + ".gn.bias"], eps=1e-5
        )
        return F.relu(x)

    def coords(h, w):
        xr = torch.linspace(-1, 1, w)
        yr = torch.linspace(-1, 1, h)
        gy, gx = torch.meshgrid(yr, xr, indexing="ij")
        return torch.stack([gx, gy])[None]  # [1, 2, h, w] (x then y)

    in_features = list(cfg.MODEL.SINGLE_STAGE_HEAD.IN_FEATURES)
    cate_preds, kernel_preds = [], []
    for f, grid in zip(in_features, s.NUM_GRIDS):
        x = feats_nchw[f]
        h, w = x.shape[-2:]
        ins_kernel_feat = torch.cat([x, coords(h, w)], dim=1)
        kernel_feat = F.interpolate(
            ins_kernel_feat, size=(grid, grid), mode="bilinear",
            align_corners=False,
        )
        cate_feat = kernel_feat[:, :-2]
        k = kernel_feat
        for i in range(s.MASK_KERNEL_NUM_CONVS):
            k = convmod(k, f"bbox_head.kernel_convs.{i}")
        kernel_preds.append(
            F.conv2d(k, t["bbox_head.solo_kernel.weight"],
                     t["bbox_head.solo_kernel.bias"], padding=1)
        )
        c = cate_feat
        for i in range(s.MASK_KERNEL_NUM_CONVS):
            c = convmod(c, f"bbox_head.cate_convs.{i}")
        cate_preds.append(
            F.conv2d(c, t["bbox_head.solo_cate.weight"],
                     t["bbox_head.solo_cate.bias"], padding=1)
        )

    import math

    common = int(math.log2(s.MASK_FEATURE_COMMON_STRIDE))
    total = None
    mask_feats = list(s.MASK_FEATURE_IN_FEATURES)
    for i, f in enumerate(mask_feats):
        x = feats_nchw[f]
        if i == len(mask_feats) - 1:
            x = torch.cat([x, coords(*x.shape[-2:])], dim=1)
        for k in range(max(1, i + 2 - common)):
            x = convmod(x, f"mask_feat_head.convs_all_levels.{i}.conv{k}")
            if i > 0:
                x = F.interpolate(
                    x, scale_factor=2, mode="bilinear", align_corners=False
                )
        total = x if total is None else total + x
    mask_pred = convmod(total, "mask_feat_head.conv_pred.0")
    return cate_preds, kernel_preds, mask_pred


def test_convert_solo_numeric_vs_torch_mmdet_head():
    torch = pytest.importorskip("torch")  # noqa: F841

    cfg = small_solo_cfg()
    rng = np.random.default_rng(11)
    sd = synth_mmdet_solov2_state(cfg, rng)
    # Realistic magnitudes: unit-normal weights through 2 convs explode;
    # scale tower weights down so outputs stay O(1) and rtol is meaningful.
    sd = {
        k: v * 0.1 if k.endswith(".weight") and v.ndim == 4 else v
        for k, v in sd.items()
    }
    converted, leftovers = convert_solo_weights(sd, cfg)
    assert leftovers == [], leftovers[:8]

    sizes = {"p2": 16, "p3": 8, "p4": 4, "p5": 2, "p6": 1}
    feats = {
        f: rng.standard_normal((1, s, s, 256)).astype(np.float32)
        for f, s in sizes.items()
    }

    from detectron2_tensorflow_tpu.models.single_stage.solov2 import SOLOv2

    drv = SOLOv2(cfg, feature_shapes={})
    module = drv.head_module(cfg, jnp.float32)
    cate_l, kernels_l, mask_features = jax.jit(
        lambda p, f: module.apply({"params": p}, f, train=False)
    )({k: v for k, v in converted["params"]["head"].items()},
      {k: jnp.asarray(v) for k, v in feats.items()})

    feats_nchw = {
        k: __import__("torch").tensor(v.transpose(0, 3, 1, 2))
        for k, v in feats.items()
    }
    with __import__("torch").no_grad():
        want_cate, want_kern, want_mask = torch_mmdet_solov2_forward(
            sd, feats_nchw, cfg
        )

    for lvl in range(len(want_cate)):
        np.testing.assert_allclose(
            np.asarray(cate_l[lvl]),
            want_cate[lvl].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(kernels_l[lvl]),
            want_kern[lvl].numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4,
        )
    got_mask = np.asarray(mask_features)
    want_mask = want_mask.numpy().transpose(0, 2, 3, 1)
    assert np.abs(want_mask).max() > 0.1, "vacuous: mask branch output ~0"
    np.testing.assert_allclose(got_mask, want_mask, rtol=1e-4, atol=1e-4)


def test_convert_darknet_numeric_vs_torch_block():
    """Darknet block: conv-BN-leaky(0.1) -> conv(+bias, linear), weights
    serialized EXACTLY like darknet save_weights (per conv: biases, then for
    BN gamma/rolling_mean/rolling_var, then OIHW floats, concatenated in
    layer order after the 5-int header). The torch side reads the SAME
    binary back by offset arithmetic; the JAX side goes through
    read_darknet_blob + convert_darknet_weights + Conv2D modules."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from detectron2_tensorflow_tpu.convert.darknet import (
        HEADER_INTS,
        convert_darknet_weights,
        read_darknet_blob,
    )
    from detectron2_tensorflow_tpu.models.layers import Conv2D

    rng = np.random.default_rng(5)
    cin, cmid, cout = 3, 16, 8
    b0_bias = rng.standard_normal(cmid).astype(np.float32)
    b0_gamma = rng.standard_normal(cmid).astype(np.float32)
    b0_mean = rng.standard_normal(cmid).astype(np.float32)
    b0_var = rng.uniform(0.5, 2, cmid).astype(np.float32)
    b0_w = (rng.standard_normal((cmid, cin, 3, 3)) * 0.2).astype(np.float32)
    b1_bias = rng.standard_normal(cout).astype(np.float32)
    b1_w = (rng.standard_normal((cout, cmid, 1, 1)) * 0.2).astype(np.float32)

    parts = [np.zeros(HEADER_INTS, np.float32)]
    parts += [b0_bias, b0_gamma, b0_mean, b0_var, b0_w.ravel()]
    parts += [b1_bias, b1_w.ravel()]
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        np.concatenate(parts).tofile(f.name)
        blob = read_darknet_blob(f.name)
    manifest = {
        "nodes": [
            {"name": "blk/c0", "in_channels": cin, "out_channels": cmid, "size": 3},
            {"name": "blk/c1", "in_channels": cmid, "out_channels": cout, "size": 1},
        ],
        "norm": {"blk/c0": "bn"},
    }
    tree, consumed = convert_darknet_weights(blob, manifest)
    assert consumed == len(blob)

    x = rng.standard_normal((1, 9, 11, cin)).astype(np.float32)

    # torch: darknet forward = conv(no bias) -> BN(eps 1e-5) -> leaky(0.1)
    # -> conv(+bias). Darknet file order: bias IS the BN beta for normed
    # convs.
    with torch.no_grad():
        tx = torch.tensor(x.transpose(0, 3, 1, 2))
        tx = F.conv2d(tx, torch.tensor(b0_w), None, padding=1)
        tx = F.batch_norm(
            tx, torch.tensor(b0_mean), torch.tensor(b0_var),
            torch.tensor(b0_gamma), torch.tensor(b0_bias), eps=1e-5,
        )
        tx = F.leaky_relu(tx, 0.1)
        tx = F.conv2d(tx, torch.tensor(b1_w), torch.tensor(b1_bias))
    want = tx.numpy().transpose(0, 2, 3, 1)

    c0 = Conv2D(cmid, 3, norm="BN", activation="leaky_relu")
    c1 = Conv2D(cout, 1)
    v0 = {
        "params": tree["params"]["blk"]["c0"],
        "batch_stats": tree["batch_stats"]["blk"]["c0"],
    }
    v1 = {"params": tree["params"]["blk"]["c1"]}
    got = np.asarray(
        c1.apply(v1, c0.apply(v0, jnp.asarray(x), train=False))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
