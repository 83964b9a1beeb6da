"""Solver: LR schedule and optimizer matching the reference semantics.

Parity targets: /root/reference/lib/solver/learning_rate.py:4-39 (piecewise-
constant with linear warmup + global-batch auto-scaling) and regularizer.py:
6-24 (L2 decay split by weights / bias / norm params). Built on optax; the
reference's loss-side regularizer collection becomes decoupled per-group
``add_decayed_weights`` masks (equivalent gradients for SGD).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax


def lr_scale(cfg) -> float:
    """Global-batch LR multiplier (linear scaling rule)."""
    if not cfg.SOLVER.AUTO_SCALE_LR_SCHEDULE:
        return 1.0
    return cfg.SOLVER.IMS_PER_BATCH / cfg.SOLVER.IMS_PER_BATCH_BASE


def scaled_max_iter(cfg) -> int:
    """MAX_ITER shrinks as the batch grows (reference trainer.py:162-164)."""
    return int(round(cfg.SOLVER.MAX_ITER / lr_scale(cfg)))


def build_lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """SOLVER.LR_SCHEDULER_NAME dispatch: WarmupMultiStepLR (linear warmup,
    gamma decays at STEPS) or WarmupCosineLR (the other upstream-Detectron2
    scheduler; the reference defines the key but never consumes it)."""
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name not in ("WarmupMultiStepLR", "WarmupCosineLR"):
        raise ValueError(f"unknown SOLVER.LR_SCHEDULER_NAME: {name!r}")
    scale = lr_scale(cfg)
    base_lr = cfg.SOLVER.BASE_LR * scale
    steps = tuple(int(round(s / scale)) for s in cfg.SOLVER.STEPS)
    max_iter = scaled_max_iter(cfg)
    gamma = cfg.SOLVER.GAMMA
    warmup_iters = cfg.SOLVER.WARMUP_ITERS
    warmup_factor = cfg.SOLVER.WARMUP_FACTOR
    warmup_method = cfg.SOLVER.WARMUP_METHOD

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "constant":
            warm = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        else:  # linear
            alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
            warm = jnp.where(
                step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0
            )
        if name == "WarmupCosineLR":
            # Upstream D2 WarmupCosineLR: 0.5 * (1 + cos(pi * t / T)) over
            # the full schedule (warmup multiplies on top, as multistep).
            frac = jnp.clip(step / max(max_iter, 1), 0.0, 1.0)
            decay = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        else:
            decay = jnp.asarray(1.0)
            for s in steps:
                decay = decay * jnp.where(step >= s, gamma, 1.0)
        return base_lr * warm * decay

    return schedule


def _param_group(path) -> str:
    """Classify a param path: 'norm' (BN/GN affine), 'bias', or 'weight'."""
    keys = [getattr(p, "key", str(p)) for p in path]
    if any("Norm" in k for k in keys):
        return "norm"
    if keys and keys[-1] == "bias":
        return "bias"
    return "weight"


def _group_mask(params, group: str):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _param_group(path) == group, params
    )


def trainable_mask(params, freeze_at: int):
    """False for params in frozen backbone stages (stem + res2..res{freeze_at}).

    Their gradients are already zero via stop_gradient; the mask additionally
    keeps weight decay and momentum from touching them.
    """
    frozen_stages = {"stem"} | {f"res{i}" for i in range(2, freeze_at + 1)}

    def is_trainable(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        if len(keys) >= 2 and keys[0] == "backbone" and keys[1] in frozen_stages:
            return False
        return True

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """SGD + momentum with per-group weight decay, global-norm clipping,
    warmup-multistep LR, bias LR factor, and frozen-stage masking."""
    schedule = build_lr_schedule(cfg)
    wd = cfg.SOLVER.WEIGHT_DECAY
    wd_bias = cfg.SOLVER.WEIGHT_DECAY_BIAS
    wd_norm = cfg.SOLVER.WEIGHT_DECAY_NORM
    bias_lr_factor = cfg.SOLVER.BIAS_LR_FACTOR

    chain = []
    if cfg.SOLVER.CLIP_GRADIENTS_BY_NORM > 0:
        chain.append(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS_BY_NORM))
    for group, decay in (("weight", wd), ("bias", wd_bias), ("norm", wd_norm)):
        if decay > 0:
            chain.append(
                optax.masked(
                    optax.add_decayed_weights(decay),
                    _group_mask(params, group),
                )
            )
    chain.append(optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=False))
    if bias_lr_factor != 1.0:
        chain.append(
            optax.masked(
                optax.scale(bias_lr_factor), _group_mask(params, "bias")
            )
        )
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    return optax.masked(tx, trainable_mask(params, cfg.MODEL.BACKBONE.FREEZE_AT))
