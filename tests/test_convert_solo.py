import numpy as np

import jax
import jax.numpy as jnp

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.convert.d2 import apply_converted
from detectron2_tensorflow_tpu.convert.solo import convert_solo_weights
from detectron2_tensorflow_tpu.models import build_model


def synth_mmdet_solov2_state(cfg, rng):
    """mmdet SOLOv2-R50 checkpoint names with random values."""
    sd = {}

    def conv(name, cin, cout, k, bias=True):
        sd[name + ".weight"] = rng.standard_normal((cout, cin, k, k)).astype(np.float32)
        if bias:
            sd[name + ".bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(name, c):
        for suf, arr in ((".weight", rng.standard_normal(c)),
                         (".bias", rng.standard_normal(c)),
                         (".running_mean", rng.standard_normal(c)),
                         (".running_var", rng.uniform(0.5, 2, c))):
            sd[name + suf] = arr.astype(np.float32)

    def gn(name, c):
        sd[name + ".weight"] = rng.standard_normal(c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32)

    # torchvision-style backbone
    conv("backbone.conv1", 3, 64, 7, bias=False); bn("backbone.bn1", 64)
    blocks = [3, 4, 6, 3]
    cin = 64
    for layer, nb in enumerate(blocks, start=1):
        cmid, cout = 64 * 2 ** (layer - 1), 256 * 2 ** (layer - 1)
        for b in range(nb):
            conv(f"backbone.layer{layer}.{b}.conv1", cin if b == 0 else cout, cmid, 1, bias=False)
            bn(f"backbone.layer{layer}.{b}.bn1", cmid)
            conv(f"backbone.layer{layer}.{b}.conv2", cmid, cmid, 3, bias=False)
            bn(f"backbone.layer{layer}.{b}.bn2", cmid)
            conv(f"backbone.layer{layer}.{b}.conv3", cmid, cout, 1, bias=False)
            bn(f"backbone.layer{layer}.{b}.bn3", cmid * 4 if False else cout)
            if b == 0:
                conv(f"backbone.layer{layer}.{b}.downsample.0", cin, cout, 1, bias=False)
                bn(f"backbone.layer{layer}.{b}.downsample.1", cout)
        cin = cout
    # FPN
    for i, cin_l in enumerate([256, 512, 1024, 2048]):
        conv(f"neck.lateral_convs.{i}.conv", cin_l, 256, 1)
        conv(f"neck.fpn_convs.{i}.conv", 256, 256, 3)
    # towers (mmdet SOLOv2Head: seg_feat_channels = MASK_KERNEL_CONVS_DIM,
    # 512 for R50 1x; cate tower conv0 in = 256, kernel tower conv0 in =
    # 256+2 coordconv)
    s = cfg.MODEL.SOLO
    d = s.MASK_KERNEL_CONVS_DIM
    for i in range(s.MASK_KERNEL_NUM_CONVS):
        conv(f"bbox_head.cate_convs.{i}.conv", 256 if i == 0 else d, d, 3, bias=False)
        gn(f"bbox_head.cate_convs.{i}.gn", d)
        conv(f"bbox_head.kernel_convs.{i}.conv", 258 if i == 0 else d, d, 3, bias=False)
        gn(f"bbox_head.kernel_convs.{i}.gn", d)
    conv("bbox_head.solo_cate", d, cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES, 3)
    conv("bbox_head.solo_kernel", d, s.MASK_KERNEL_SIZE**2 * s.MASK_FEATURE_OUT_DIMS, 3)
    # mask feature branch
    import math
    common = int(math.log2(s.MASK_FEATURE_COMMON_STRIDE))
    for i, f in enumerate(s.MASK_FEATURE_IN_FEATURES):
        for k in range(max(1, i + 2 - common)):
            cin_m = (256 + (2 if (i == len(s.MASK_FEATURE_IN_FEATURES) - 1 and k == 0) else 0)
                     if k == 0 else s.MASK_FEATURE_CONVS_DIM)
            conv(f"mask_feat_head.convs_all_levels.{i}.conv{k}.conv", cin_m,
                 s.MASK_FEATURE_CONVS_DIM, 3, bias=False)
            gn(f"mask_feat_head.convs_all_levels.{i}.conv{k}.gn", s.MASK_FEATURE_CONVS_DIM)
    conv("mask_feat_head.conv_pred.0.conv", s.MASK_FEATURE_CONVS_DIM,
         s.MASK_FEATURE_OUT_DIMS, 1, bias=False)
    gn("mask_feat_head.conv_pred.0.gn", s.MASK_FEATURE_OUT_DIMS)
    return sd


def test_convert_solo_covers_leftovers():
    cfg = get_cfg()
    cfg.merge_from_file(
        "/root/repo/configs/COCO-InstanceSegmentation/solo_v2_R_50_FPN_1x.yaml"
    )
    cfg.MODEL.RESNETS.DEPTH = 50
    rng = np.random.default_rng(0)
    sd = synth_mmdet_solov2_state(cfg, rng)
    converted, leftovers = convert_solo_weights(sd, cfg)
    assert leftovers == [], leftovers[:8]

    # The converted tree must merge into a real SOLOv2 model with EXACT
    # shape agreement on every leaf — this is the mmdet tower-wiring
    # contract (ROUND2 #6): per the mmdet/original-SOLO `_init_layers`
    # (SOLOv2Head), the KERNEL tower's conv0 takes in_channels+2 (the
    # coordconv channels survive the grid resize), the CATE tower's conv0
    # takes in_channels only (`cate_feat = kernel_feat[:, :-2]` drops the
    # coords), and the mask-feature branch appends coords only on its
    # coarsest level's first conv. Our head wires the same widths; a
    # disagreement would fail the shape assert below loudly.
    model = build_model(cfg)
    batch = {"image": jnp.zeros((1, 64, 64, 3)), "image_size": jnp.array([[64, 64]])}
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)

    def paths(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from paths(v, prefix + (k,))
            else:
                yield prefix + (k,), tuple(v.shape)

    model_shapes = dict(paths(variables["params"]))
    conv_shapes = dict(paths(converted["params"]))
    missing = {p for p in conv_shapes if p not in model_shapes}
    assert missing == set(), sorted(missing)[:5]
    mismatched = {
        p: (s, model_shapes[p])
        for p, s in conv_shapes.items()
        if s != model_shapes[p]
    }
    assert mismatched == {}, list(mismatched.items())[:5]

    # Pin the coordconv widths explicitly (the contract itself, so a future
    # head refactor cannot silently re-wire the towers).
    p = variables["params"]["head"]
    assert p["kernel_tower_0"]["conv"]["kernel"].shape[2] == 256 + 2
    assert p["cate_tower_0"]["conv"]["kernel"].shape[2] == 256
    f_last = cfg.MODEL.SOLO.MASK_FEATURE_IN_FEATURES[-1]
    assert p[f"mask_{f_last}_0"]["conv"]["kernel"].shape[2] == 256 + 2

    # The converted weights must APPLY: overlay onto init variables and run
    # a jitted forward (catches dtype/collection mistakes, not just shapes).
    real = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    merged = apply_converted(real, converted)
    out = jax.jit(model.predict)(merged, batch)
    assert np.isfinite(np.asarray(out.scores)).all()
