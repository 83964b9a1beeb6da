import json
import os

import cv2
import numpy as np
import pytest

from detectron2_tensorflow_tpu.data.panoptic import (
    CocoPanopticDataset,
    id_to_rgb,
    rgb_to_id,
)


def test_rgb_id_roundtrip():
    ids = np.array([0, 1, 255, 256, 70000, 256**3 - 1])
    np.testing.assert_array_equal(rgb_to_id(id_to_rgb(ids)), ids)


def test_panoptic_dataset(tmp_path):
    os.makedirs(tmp_path / "pano", exist_ok=True)
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    h, w = 48, 64
    cv2.imwrite(str(tmp_path / "imgs" / "0.jpg"), np.full((h, w, 3), 40, np.uint8))
    seg = np.zeros((h, w), np.int64)
    seg[4:20, 4:28] = 7  # thing instance, category 1
    seg[30:48, 0:64] = 9  # stuff region, category 10
    png = cv2.cvtColor(id_to_rgb(seg), cv2.COLOR_RGB2BGR)
    cv2.imwrite(str(tmp_path / "pano" / "0.png"), png)
    pano_json = {
        "images": [{"id": 0, "file_name": "0.jpg", "height": h, "width": w}],
        "annotations": [
            {
                "image_id": 0,
                "file_name": "0.png",
                "segments_info": [
                    {"id": 7, "category_id": 1, "iscrowd": 0, "area": 384},
                    {"id": 9, "category_id": 10, "iscrowd": 0, "area": 1152},
                ],
            }
        ],
        "categories": [
            {"id": 1, "name": "cat", "isthing": 1},
            {"id": 10, "name": "grass", "isthing": 0},
        ],
    }
    with open(tmp_path / "pano.json", "w") as f:
        json.dump(pano_json, f)

    ds = CocoPanopticDataset(
        str(tmp_path / "pano.json"), str(tmp_path / "pano"), str(tmp_path / "imgs")
    )
    s = ds[0]
    np.testing.assert_allclose(s["boxes"], [[4, 4, 28, 20]])
    assert s["classes"].tolist() == [0]
    # semseg: thing pixels -> 0, stuff -> 1, unlabeled -> ignore (-1)
    assert s["sem_seg"][10, 10] == 0
    assert s["sem_seg"][40, 10] == 1
    assert s["sem_seg"][0, 0] == -1
    assert s["masks"][0, 10, 10] == 1.0
    assert ds.stuff_classes == ["things", "grass"]


def test_caffe2_backbone_convert():
    from detectron2_tensorflow_tpu.convert.backbone import convert_caffe2_backbone

    rng = np.random.default_rng(0)
    blobs = {}

    def conv(name, cin, cout, k):
        blobs[name + "_w"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        blobs[name + "_bn_s"] = rng.standard_normal(cout).astype(np.float32)
        blobs[name + "_bn_b"] = rng.standard_normal(cout).astype(np.float32)

    blobs["conv1_w"] = rng.standard_normal((64, 3, 7, 7)).astype(np.float32)
    blobs["res_conv1_bn_s"] = np.ones(64, np.float32)
    blobs["res_conv1_bn_b"] = np.zeros(64, np.float32)
    conv("res2_0_branch2a", 64, 64, 1)
    conv("res2_0_branch2b", 64, 64, 3)
    conv("res2_0_branch2c", 64, 256, 1)
    conv("res2_0_branch1", 64, 256, 1)
    blobs["fc1000_w"] = np.zeros((1000, 2048), np.float32)

    out, leftovers = convert_caffe2_backbone(blobs)
    assert leftovers == []
    assert out["params"]["backbone"]["stem"]["conv1"]["conv"]["kernel"].shape == (
        7, 7, 3, 64,
    )
    assert out["params"]["backbone"]["res2"]["0"]["conv2"]["conv"]["kernel"].shape == (
        3, 3, 64, 64,
    )
    fbn = out["frozen"]["backbone"]["res2"]["0"]["shortcut"]["FrozenBatchNorm_0"]
    # absorbed stats: (x - 0) * s / sqrt(1 - eps + eps) + b == x * s + b
    assert fbn["mean"].max() == 0.0
    np.testing.assert_allclose(fbn["var"] + 1e-5, 1.0, atol=1e-7)


@pytest.mark.slow
def test_torchvision_backbone_convert():
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.convert.d2 import apply_converted
    from detectron2_tensorflow_tpu.convert.torchvision import (
        convert_torchvision_backbone,
    )
    from detectron2_tensorflow_tpu.models.backbones.resnet import (
        BLOCKS_PER_STAGE,
        build_resnet_backbone,
    )

    rng = np.random.default_rng(0)
    sd = {}

    def conv_bn(conv, bn, cin, cout, k):
        sd[conv + ".weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        for suffix, arr in (
            (".weight", rng.standard_normal(cout)),
            (".bias", rng.standard_normal(cout)),
            (".running_mean", rng.standard_normal(cout)),
            (".running_var", rng.uniform(0.5, 2, cout)),
        ):
            sd[bn + suffix] = arr.astype(np.float32)

    conv_bn("conv1", "bn1", 3, 64, 7)
    cin = 64
    for layer, nb in enumerate(BLOCKS_PER_STAGE[50], start=1):
        cmid = 64 * 2 ** (layer - 1)
        cout = 256 * 2 ** (layer - 1)
        for b in range(nb):
            conv_bn(f"layer{layer}.{b}.conv1", f"layer{layer}.{b}.bn1",
                    cin if b == 0 else cout, cmid, 1)
            conv_bn(f"layer{layer}.{b}.conv2", f"layer{layer}.{b}.bn2", cmid, cmid, 3)
            conv_bn(f"layer{layer}.{b}.conv3", f"layer{layer}.{b}.bn3", cmid, cout, 1)
            if b == 0:
                conv_bn(f"layer{layer}.{b}.downsample.0",
                        f"layer{layer}.{b}.downsample.1", cin, cout, 1)
        cin = cout
    sd["fc.weight"] = np.zeros((1000, 2048), np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)

    converted, leftovers = convert_torchvision_backbone(sd)
    assert leftovers == [], leftovers[:5]

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.RESNETS.STRIDE_IN_1X1 = False
    module, _ = build_resnet_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    # merge-check against the real model tree (shapes + coverage)
    merged = apply_converted(
        {"params": {"backbone": variables["params"]},
         "frozen": {"backbone": variables["frozen"]}},
        converted,
    )
    n_leaves = len(jax.tree.leaves(converted["params"])) + len(
        jax.tree.leaves(converted["frozen"])
    )
    n_model = len(jax.tree.leaves(variables["params"])) + len(
        jax.tree.leaves(variables["frozen"])
    )
    assert n_leaves == n_model
