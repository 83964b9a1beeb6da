"""Multi-device (virtual 8-CPU mesh) training-step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-detector jit compiles



def test_dryrun_multichip_8():
    import __graft_entry__

    assert len(jax.devices()) >= 8  # conftest forces 8 CPU devices
    __graft_entry__.dryrun_multichip(8)


def test_sharded_step_matches_single_device():
    """The sharded train step must compute the same global loss as the
    unsharded one (replicated params, same batch, same rng)."""
    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.engine import build_train_step, create_train_state
    from detectron2_tensorflow_tpu.models import build_model
    from detectron2_tensorflow_tpu.parallel import create_mesh, replicate, shard_batch

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SingleStageDetector"
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.NECK.NAME = "FPN"
    cfg.MODEL.NECK.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.NECK.TOP_BLOCK_TYPE = "P6P7"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 3

    model = build_model(cfg)
    b = 8
    batch = {
        "image": jnp.tile(
            jnp.arange(b, dtype=jnp.float32)[:, None, None, None], (1, 64, 64, 3)
        )
        * 10.0,
        "image_size": jnp.tile(jnp.array([[64, 64]]), (b, 1)),
        "gt_boxes": jnp.tile(jnp.array([[[4.0, 4.0, 40.0, 40.0]]]), (b, 1, 1)),
        "gt_classes": jnp.ones((b, 1), jnp.int32),
        "gt_valid": jnp.ones((b, 1), bool),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)

    # Single-device step.
    step1 = build_train_step(cfg, model, state.params, mesh=None)
    _, m1 = step1(state, batch)

    # Sharded step on the 8-device mesh (fresh state: step1 donated its input).
    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    mesh = create_mesh(data_axis=8, model_axis=1)
    state2 = replicate(mesh, state2)
    step8 = build_train_step(cfg, model, state2.params, mesh=mesh)
    _, m8 = step8(state2, shard_batch(mesh, batch))

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-4, atol=1e-5,
        ), k

    # dp x tp: 4 data x 2 model — large kernels column-sharded over 'model'
    # (parallel.leaf_sharding); the losses must not change.
    from detectron2_tensorflow_tpu.parallel import shard_state

    state3 = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    mesh2 = create_mesh(data_axis=4, model_axis=2)
    state3 = shard_state(mesh2, state3)
    step42 = build_train_step(
        cfg, model, state3.params, mesh=mesh2, example_state=state3
    )
    _, m42 = step42(state3, shard_batch(mesh2, batch))
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m42[k]), rtol=2e-4, atol=1e-5,
        ), k


def test_syncbn_sharded_moments_match_global():
    """SyncBN correctness under the mesh: with MODEL.RESNETS.NORM="SyncBN"
    the sharded step's BN moments must be GLOBAL-batch statistics, so its
    losses and updated running stats must equal the single-device run on
    the same (per-image distinct) batch. If the moments were per-device,
    every normalized activation — and hence the loss — would differ.
    Covers configs/Misc/mask_rcnn_R_50_FPN_3x_syncbn.yaml's training mode
    (reference normalization.py:120-165 NCCL all-reduce of mean/meansq)."""
    from detectron2_tensorflow_tpu.config import get_cfg
    from detectron2_tensorflow_tpu.engine import build_train_step, create_train_state
    from detectron2_tensorflow_tpu.models import build_model
    from detectron2_tensorflow_tpu.parallel import create_mesh, replicate, shard_batch

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SingleStageDetector"
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.RESNETS.NORM = "SyncBN"
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.MODEL.NECK.NAME = "FPN"
    cfg.MODEL.NECK.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.NECK.TOP_BLOCK_TYPE = "P6P7"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 3

    model = build_model(cfg)
    b = 8
    rng = np.random.default_rng(3)
    batch = {
        # per-image DISTINCT content so per-device moments != global moments
        "image": jnp.asarray(rng.uniform(0, 255, (b, 64, 64, 3)).astype(np.float32)),
        "image_size": jnp.tile(jnp.array([[64, 64]]), (b, 1)),
        "gt_boxes": jnp.tile(jnp.array([[[4.0, 4.0, 40.0, 40.0]]]), (b, 1, 1)),
        "gt_classes": jnp.ones((b, 1), jnp.int32),
        "gt_valid": jnp.ones((b, 1), bool),
    }
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    step1 = build_train_step(cfg, model, state.params, mesh=None)
    s1, m1 = step1(state, batch)

    state2 = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
    mesh = create_mesh(data_axis=8, model_axis=1)
    state2 = replicate(mesh, state2)
    step8 = build_train_step(cfg, model, state2.params, mesh=mesh)
    s8, m8 = step8(state2, shard_batch(mesh, batch))

    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=2e-4, atol=1e-5, err_msg=k
        )
    # The updated running statistics must match too (they are the EMA of
    # the batch moments — global-batch on both paths).
    bs1 = jax.tree_util.tree_leaves(s1.model_state.get("batch_stats", {}))
    bs8 = jax.tree_util.tree_leaves(s8.model_state.get("batch_stats", {}))
    assert bs1 and len(bs1) == len(bs8)
    for a, c in zip(bs1, bs8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=1e-5
        )


def test_sharded_eval_predict_matches_single_device():
    """engine.evaluator.build_predict under a multi-device host must shard
    the eval batch over the 'data' mesh axis and produce the SAME
    detections as a plain single-device jit (per-image inference is
    data-parallel-exact)."""
    from detectron2_tensorflow_tpu.engine.evaluator import build_predict
    from detectron2_tensorflow_tpu.models import build_model
    from detectron2_tensorflow_tpu.parallel import set_active_mesh
    from tests.test_end_to_end import tiny_rcnn_cfg

    cfg = tiny_rcnn_cfg()
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    model = build_model(cfg)

    b = 8
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 255, (b, 64, 96, 3)).astype(np.float32)
        ),
        "image_size": jnp.tile(jnp.array([[64, 96]], jnp.int32), (b, 1)),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), batch)

    want = jax.device_get(jax.jit(model.predict)(variables, batch))
    try:
        predict = build_predict(cfg, model)
        got = jax.device_get(predict(variables, batch))
    finally:
        set_active_mesh(None)

    np.testing.assert_allclose(
        np.asarray(got.boxes), np.asarray(want.boxes), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(want.scores), rtol=1e-5, atol=1e-5
    )
    assert (np.asarray(got.pred_classes) == np.asarray(want.pred_classes)).all()
    assert (np.asarray(got.is_valid) == np.asarray(want.is_valid)).all()
