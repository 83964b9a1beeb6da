"""Solver tests: LR schedules (multistep + cosine), auto-scaling, and the
per-group weight-decay masks.

Parity target: /root/reference/lib/solver/learning_rate.py:4-39 (warmup
multistep with global-batch auto-scaling). SOLVER.LR_SCHEDULER_NAME is
defined in the reference schema but consumed nowhere in its lib/; here it
dispatches WarmupMultiStepLR / WarmupCosineLR (upstream-D2 semantics).
"""

import numpy as np
import pytest

from detectron2_tensorflow_tpu.config import get_cfg
from detectron2_tensorflow_tpu.solver import (
    build_lr_schedule,
    lr_scale,
    scaled_max_iter,
)


def _cfg(**solver):
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.WARMUP_FACTOR = 0.001
    cfg.SOLVER.STEPS = (600, 800)
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.MAX_ITER = 1000
    cfg.SOLVER.AUTO_SCALE_LR_SCHEDULE = False
    for k, v in solver.items():
        setattr(cfg.SOLVER, k, v)
    return cfg


def test_multistep_warmup_and_decays():
    sched = build_lr_schedule(_cfg())
    # Linear warmup: factor -> 1 over WARMUP_ITERS.
    assert np.isclose(float(sched(0)), 0.02 * 0.001)
    assert np.isclose(float(sched(50)), 0.02 * (0.001 * 0.5 + 0.5))
    assert np.isclose(float(sched(100)), 0.02)
    assert np.isclose(float(sched(599)), 0.02)
    assert np.isclose(float(sched(600)), 0.002)
    assert np.isclose(float(sched(800)), 0.0002)


def test_constant_warmup_method():
    sched = build_lr_schedule(_cfg(WARMUP_METHOD="constant"))
    assert np.isclose(float(sched(50)), 0.02 * 0.001)
    assert np.isclose(float(sched(100)), 0.02)


def test_cosine_schedule():
    sched = build_lr_schedule(_cfg(LR_SCHEDULER_NAME="WarmupCosineLR"))
    # Post-warmup cosine over MAX_ITER: half the base LR at T/2, ~0 at T.
    assert np.isclose(float(sched(100)), 0.02 * 0.5 * (1 + np.cos(np.pi * 0.1)))
    assert np.isclose(float(sched(500)), 0.01)
    assert np.isclose(float(sched(1000)), 0.0, atol=1e-9)
    # Warmup still applies multiplicatively.
    assert float(sched(0)) < float(sched(100))


def test_unknown_scheduler_raises():
    with pytest.raises(ValueError):
        build_lr_schedule(_cfg(LR_SCHEDULER_NAME="Nope"))


def test_auto_scale_shifts_steps_and_max_iter():
    cfg = _cfg(AUTO_SCALE_LR_SCHEDULE=True)
    cfg.SOLVER.IMS_PER_BATCH = 32
    cfg.SOLVER.IMS_PER_BATCH_BASE = 16
    assert lr_scale(cfg) == 2.0
    assert scaled_max_iter(cfg) == 500
    sched = build_lr_schedule(cfg)
    # Doubled LR, halved decay step positions (reference trainer.py:162-164).
    assert np.isclose(float(sched(150)), 0.04)
    assert np.isclose(float(sched(300)), 0.004)


def test_weight_decay_group_masks():
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.solver import _group_mask

    params = {
        "backbone": {
            "conv1": {"kernel": jnp.zeros((3, 3, 3, 8)), "bias": jnp.zeros(8)},
            "FrozenBatchNorm_0": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        }
    }
    w = _group_mask(params, "weight")
    b = _group_mask(params, "bias")
    n = _group_mask(params, "norm")
    assert w["backbone"]["conv1"]["kernel"] is True
    assert b["backbone"]["conv1"]["bias"] is True
    # Norm affine params (scale AND bias) decay under WEIGHT_DECAY_NORM only.
    assert n["backbone"]["FrozenBatchNorm_0"]["scale"] is True
    assert n["backbone"]["FrozenBatchNorm_0"]["bias"] is True
    assert b["backbone"]["FrozenBatchNorm_0"]["bias"] is False
    assert w["backbone"]["FrozenBatchNorm_0"]["scale"] is False
