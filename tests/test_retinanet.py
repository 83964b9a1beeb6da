import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.models import build_model

pytestmark = pytest.mark.slow  # full-detector jit compiles



def retinanet_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SingleStageDetector"
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.RESNETS.DEPTH = 18  # small for CPU test speed
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.NECK.NAME = "FPN"
    cfg.MODEL.NECK.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.NECK.TOP_BLOCK_TYPE = "P6P7"
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 50
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    return cfg


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = retinanet_cfg()
    model = build_model(cfg)
    batch = {
        "image": jnp.zeros((2, 64, 96, 3), jnp.float32),
        "image_size": jnp.array([[60, 90], [64, 96]]),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return model, variables, batch


def test_retinanet_predict_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    out = jax.jit(model.predict)(variables, batch)
    assert out.boxes.shape == (2, 10, 4)
    assert out.scores.shape == (2, 10)
    assert out.pred_classes.shape == (2, 10)
    # Boxes are clipped to each image's true size.
    b0 = np.asarray(out.boxes[0])
    assert b0[:, 2].max() <= 90 + 1e-3 and b0[:, 3].max() <= 60 + 1e-3


def test_retinanet_loss_and_frozen_grads(model_and_vars):
    model, variables, batch = model_and_vars
    gt = {
        **batch,
        "gt_boxes": jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (2, 1, 1)),
        "gt_classes": jnp.zeros((2, 1), jnp.int32),
        "gt_valid": jnp.ones((2, 1), bool),
    }
    rng = jax.random.PRNGKey(1)

    def scalar_loss(p):
        total, _ = model.loss_fn(
            {**variables, "params": p}, gt, rng, model.initial_state
        )
        return total

    total, grads = jax.jit(jax.value_and_grad(scalar_loss))(variables["params"])
    assert np.isfinite(float(total))
    # freeze_at=2: stem and res2... depth-18 trunk starts at res2 internally;
    # res2 params must receive zero gradient, res5 nonzero.
    g2 = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["backbone"]["res2"]))
    g5 = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads["backbone"]["res5"]))
    assert g2 == 0.0
    assert g5 > 0.0


def test_retinanet_loss_normalizer_ema(model_and_vars):
    model, variables, batch = model_and_vars
    gt = {
        **batch,
        "gt_boxes": jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (2, 1, 1)),
        "gt_classes": jnp.zeros((2, 1), jnp.int32),
        "gt_valid": jnp.ones((2, 1), bool),
    }
    _, (_, state) = jax.jit(model.loss_fn)(
        variables, gt, jax.random.PRNGKey(0), model.initial_state
    )
    n0 = float(model.initial_state["loss_normalizer"])
    n1 = float(state["loss_normalizer"])
    # Reference semantics (single_stage_heads/retinanet.py:101-108, 202-207):
    # init 100, new = 0.9*old + 0.1*max(1, num_fg), losses divided by the
    # UPDATED value. Back out num_fg and pin the recurrence exactly.
    assert n0 == 100.0
    num_fg = (n1 - 0.9 * n0) / 0.1
    assert num_fg >= 1.0 and abs(num_fg - round(num_fg)) < 1e-3  # a count
    _, (_, state2) = jax.jit(model.loss_fn)(
        variables, gt, jax.random.PRNGKey(0), state
    )
    n2 = float(state2["loss_normalizer"])
    # Same batch => same num_fg; the EMA recurrence must hold exactly.
    assert abs(n2 - (0.9 * n1 + 0.1 * num_fg)) < 1e-2


def test_retinanet_no_gt_still_trains(model_and_vars):
    model, variables, batch = model_and_vars
    gt = {
        **batch,
        "gt_boxes": jnp.zeros((2, 1, 4)),
        "gt_classes": jnp.zeros((2, 1), jnp.int32),
        "gt_valid": jnp.zeros((2, 1), bool),  # empty image
    }
    total, (losses, _) = jax.jit(model.loss_fn)(
        variables, gt, jax.random.PRNGKey(0), model.initial_state
    )
    assert np.isfinite(float(total))
    assert float(losses["loss_box_reg"]) == 0.0  # no positives
