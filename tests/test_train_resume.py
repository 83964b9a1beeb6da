"""Pretrained initialization and checkpoint resume (reference
trainer.py:70-107 shape-filtered restore; trainer.py:191-197 auto-resume)."""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron2_tensorflow_tpu.data import build_dataloader
from detectron2_tensorflow_tpu.engine.checkpoint import (
    latest_step,
    load_pretrained,
    overlay_compatible,
    restore_variables,
)
from detectron2_tensorflow_tpu.engine.train import train
from detectron2_tensorflow_tpu.models import build_model
from detectron2_tensorflow_tpu.parallel import create_mesh
from tests.test_data import SyntheticDataset
from tests.test_end_to_end import tiny_rcnn_cfg

pytestmark = pytest.mark.slow  # full-detector jit compiles



def test_overlay_compatible_filters_by_name_and_shape(caplog):
    variables = {
        "params": {
            "conv": {"kernel": np.zeros((3, 3, 4, 8), np.float32)},
            "head": {"bias": np.zeros((8,), np.float32)},
        }
    }
    restored = {
        "params": {
            "conv": {"kernel": np.ones((3, 3, 4, 8), np.float32)},
            "head": {"bias": np.ones((5,), np.float32)},  # shape mismatch
            "extra": {"w": np.ones((2,), np.float32)},  # not in model
        },
        "ghost_collection": {"x": np.ones(1)},
    }
    with caplog.at_level(logging.WARNING):
        out = overlay_compatible(variables, restored)
    assert np.asarray(out["params"]["conv"]["kernel"]).sum() == 3 * 3 * 4 * 8
    # mismatched + missing leaves keep the model's values
    assert np.asarray(out["params"]["head"]["bias"]).sum() == 0
    assert "extra" not in out["params"]
    warnings = caplog.text
    assert "shape" in warnings and "not in model" in warnings


def _mesh():
    # batch 2 < the 8-device test mesh; run the loop on one device
    return create_mesh(1, 1, devices=jax.devices()[:1])


def _cfg():
    cfg = tiny_rcnn_cfg()
    cfg.MODEL.MASK_ON = False  # lighter compile for the loop tests
    cfg.SOLVER.SHORT_TERM_SAVE_STEPS = 1
    cfg.SOLVER.SHORT_TERM_NUM_STEPS = 10
    cfg.SOLVER.LONG_TERM_SAVE_STEPS = 100
    cfg.TEST.EVAL_PERIOD = 0
    return cfg


def test_train_resume_and_pretrained_init(tmp_path):
    cfg = _cfg()
    ds = SyntheticDataset(n=4, num_classes=3, with_masks=False)
    model = build_model(cfg)
    ckpt_dir = str(tmp_path / "train")

    def data():
        it = build_dataloader(cfg, ds, training=True, seed=0)
        return ({k: jnp.asarray(v) for k, v in b.items()} for b in it)

    # -- fresh run: 2 steps, checkpoints land --------------------------------
    state1 = train(cfg, model, data(), mesh=_mesh(), max_iter=2,
                   checkpoint_dir=ckpt_dir, log_every=1)
    assert int(state1.step) == 2
    assert latest_step(ckpt_dir) == 2

    # -- resume with the SAME max_iter: nothing to do, state restored --------
    state2 = train(cfg, model, data(), mesh=_mesh(), max_iter=2,
                   checkpoint_dir=ckpt_dir, log_every=1)
    assert int(state2.step) == 2
    # restored params equal the step-2 params bit-for-bit (no retraining)
    l1 = jax.tree.leaves(jax.device_get(state1.params))
    l2 = jax.tree.leaves(jax.device_get(state2.params))
    assert all(np.array_equal(a, b) for a, b in zip(l1, l2))

    # -- resume to a LARGER max_iter: continues from step 2, not 0 -----------
    state3 = train(cfg, model, data(), mesh=_mesh(), max_iter=4,
                   checkpoint_dir=ckpt_dir, log_every=1)
    assert int(state3.step) == 4
    assert latest_step(ckpt_dir) == 4
    # step 3-4 actually trained: params moved on from the restored ones
    l3 = jax.tree.leaves(jax.device_get(state3.params))
    assert any(not np.array_equal(a, b) for a, b in zip(l1, l3))

    # -- pretrained init: point PRETRAINS.WEIGHTS at the final checkpoint ----
    import orbax.checkpoint as ocp

    variables = {
        "params": jax.device_get(state3.params),
        **jax.device_get(state3.model_state),
    }
    pre_dir = str(tmp_path / "pretrained")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(pre_dir), variables, force=True)
    ckptr.wait_until_finished()

    cfg2 = _cfg()
    cfg2.PRETRAINS.WEIGHTS = pre_dir
    fresh_dir = str(tmp_path / "finetune")
    # 1 step of fine-tuning from the pretrained weights must start from them:
    # train for 0 effective steps by resuming... instead check load path
    # directly (train() calls load_pretrained on fresh runs).
    sample = next(data())
    init = jax.jit(model.init)(jax.random.PRNGKey(0), sample)
    loaded = load_pretrained(cfg2, model, init)
    got = jax.tree.leaves(jax.device_get(loaded["params"]))
    want = jax.tree.leaves(variables["params"])
    assert all(np.array_equal(a, b) for a, b in zip(got, want))

    # restore_variables also understands training-loop checkpoints
    step_dir = os.path.join(ckpt_dir, "4")
    rv = restore_variables(step_dir, init)
    got = jax.tree.leaves(jax.device_get(rv["params"]))
    assert all(np.array_equal(a, b) for a, b in zip(got, want))


def test_eval_period_invokes_eval_fn(tmp_path):
    cfg = _cfg()
    cfg.TEST.EVAL_PERIOD = 2
    ds = SyntheticDataset(n=4, num_classes=3, with_masks=False)
    model = build_model(cfg)

    def data():
        it = build_dataloader(cfg, ds, training=True, seed=0)
        return ({k: jnp.asarray(v) for k, v in b.items()} for b in it)

    calls = []

    def eval_fn(variables, step):
        assert "params" in variables
        calls.append(step)
        return {"fake/metric": 1.0}

    train(cfg, model, data(), mesh=_mesh(), max_iter=4,
          checkpoint_dir=str(tmp_path / "t"), log_every=1, eval_fn=eval_fn)
    # period-2 over 4 iters: eval at 2 (mid) and 4 (final)
    assert calls == [2, 4]
