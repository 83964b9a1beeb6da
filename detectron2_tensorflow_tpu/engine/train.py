"""Training engine: functional train state, jitted sharded step, loop.

Replaces the reference trainer (/root/reference/lib/engine/trainer.py:43-199)
and the whole model_deploy clone machinery: one ``jit`` over the mesh is the
multi-device training step. Checkpointing is Orbax with the reference's
two-tier retention policy (solver/checkpoint_keeper.py:6-50 semantics).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.meta_arch.common import DetectorModel
from ..parallel import (
    batch_sharding,
    create_mesh,
    replicate,
    shard_batch,
    shard_state,
    state_shardings,
)
from ..solver import build_optimizer, scaled_max_iter

logger = logging.getLogger(__name__)


def _merge_tree(dst, src):
    """Recursively overlay src dict onto dst dict (returns a new dict)."""
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_tree(out[k], v)
        else:
            out[k] = v
    return out


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    model_state: Any  # non-trainable collections (frozen BN, batch_stats)
    opt_state: Any
    aux: Any  # model-driver state (e.g. RetinaNet EMA loss normalizer)
    rng: jax.Array


def create_train_state(cfg, model: DetectorModel, rng: jax.Array, sample_batch) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = jax.jit(model.init)(init_rng, sample_batch)
    variables = dict(variables)
    params = variables.pop("params")
    tx = build_optimizer(cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=variables,
        opt_state=tx.init(params),
        # Fresh copies: the model's initial_state template is shared across
        # states, and the donated train step would otherwise delete it.
        aux=jax.tree.map(jnp.array, model.initial_state),
        rng=state_rng,
    )


def build_train_step(cfg, model: DetectorModel, example_params, mesh=None,
                     example_state=None):
    """Returns jitted step_fn(state, batch) -> (state, metrics).

    With a mesh: batch sharded over 'data'; params replicated — or, when
    the mesh has a 'model' axis > 1 and ``example_state`` is given,
    column-sharded over it (tensor parallelism via parallel.leaf_sharding).
    XLA's sharding propagation inserts the ICI gradient all-reduce (there
    is no explicit pmean — see parallel/__init__.py).
    """
    from ..parallel import set_active_mesh

    # Mosaic kernels wrap themselves in shard_map over this mesh's 'data'
    # axis (GSPMD can't auto-partition custom calls); register it before
    # the step traces.
    set_active_mesh(mesh)
    tx = build_optimizer(cfg, example_params)

    def step_fn(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)

        def scalar_loss(params):
            variables = {"params": params, **state.model_state}
            total, (loss_dict, new_aux) = model.loss_fn(
                variables, batch, step_rng, state.aux
            )
            return total, (loss_dict, new_aux)

        (total, (loss_dict, new_aux)), grads = jax.value_and_grad(
            scalar_loss, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"total_loss": total, **loss_dict}
        # Fold BatchNorm running-stat updates (if any) back into model state.
        model_state = state.model_state
        new_aux = dict(new_aux)
        bn_updates = new_aux.pop("batch_stats_updates", None)
        if bn_updates:
            model_state = dict(model_state)
            model_state["batch_stats"] = _merge_tree(
                model_state["batch_stats"], bn_updates
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=model_state,
            opt_state=new_opt_state,
            aux=new_aux,
            rng=rng,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    bs = batch_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    if mesh.shape.get("model", 1) > 1 and example_state is not None:
        # dp x tp: batch over 'data', large kernels (and their optimizer
        # mirrors) column-split over 'model' (parallel.leaf_sharding); XLA
        # propagates the channel sharding and inserts the collectives.
        st = state_shardings(mesh, example_state)
        return jax.jit(
            step_fn,
            donate_argnums=(0,),
            in_shardings=(st, bs),
            out_shardings=(st, rep),
        )
    return jax.jit(
        step_fn,
        donate_argnums=(0,),
        in_shardings=(rep, bs),
        out_shardings=(rep, rep),
    )


def train(
    cfg,
    model: DetectorModel,
    data_iter: Iterator[Dict],
    mesh=None,
    max_iter: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    log_every: int = 10,
    eval_fn: Optional[Callable[[Dict, int], Dict[str, float]]] = None,
) -> TrainState:
    """The reference's MonitoredTrainingSession loop, functionally.

    ``data_iter`` yields device-ready batch dicts (fixed shapes). Returns the
    final TrainState.

    Startup order matches the reference trainer: if ``checkpoint_dir`` holds
    a previous run, training RESUMES from its latest step (trainer.py:191-197
    — preemption recovery); otherwise a configured PRETRAINS source
    initializes the weights with shape filtering (trainer.py:70-107).

    ``eval_fn(variables, step) -> metrics`` runs every TEST.EVAL_PERIOD
    steps (and at the end) when provided.
    """
    if mesh is None:
        mesh = create_mesh(cfg.PARALLEL.DATA_AXIS, cfg.PARALLEL.MODEL_AXIS)
    max_iter = max_iter if max_iter is not None else scaled_max_iter(cfg)

    rng = jax.random.PRNGKey(max(cfg.SEED, 0))
    first = next(data_iter)
    state = create_train_state(cfg, model, rng, first)

    ckpt_mgr = None
    if checkpoint_dir:
        import orbax.checkpoint as ocp

        ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(checkpoint_dir),
            options=ocp.CheckpointManagerOptions(
                save_interval_steps=cfg.SOLVER.SHORT_TERM_SAVE_STEPS,
                max_to_keep=max(
                    1,
                    cfg.SOLVER.SHORT_TERM_NUM_STEPS
                    // max(cfg.SOLVER.SHORT_TERM_SAVE_STEPS, 1),
                ),
                keep_period=cfg.SOLVER.LONG_TERM_SAVE_STEPS,
            ),
        )

    start_step = 0
    resume_step = ckpt_mgr.latest_step() if ckpt_mgr is not None else None
    if resume_step is not None:
        import orbax.checkpoint as ocp

        template = jax.device_get({
            "params": state.params,
            "model_state": state.model_state,
            "opt_state": state.opt_state,
            "aux": state.aux,
            "step": state.step,
        })
        restored = ckpt_mgr.restore(
            resume_step, args=ocp.args.StandardRestore(template)
        )
        state = state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            model_state=restored["model_state"],
            opt_state=restored["opt_state"],
            aux=restored["aux"],
        )
        start_step = int(restored["step"])
        logger.info("resumed from checkpoint step %d", start_step)
    else:
        from .checkpoint import load_pretrained

        variables = {"params": state.params, **state.model_state}
        loaded = load_pretrained(cfg, model, variables)
        if loaded is not variables:
            loaded = dict(loaded)
            state = state.replace(
                params=loaded.pop("params"), model_state=loaded
            )

    if mesh.shape.get("model", 1) > 1:
        state = shard_state(mesh, state)
    else:
        state = replicate(mesh, state)
    step_fn = build_train_step(cfg, model, state.params, mesh, example_state=state)

    metric_logger = None
    if checkpoint_dir and jax.process_index() == 0:
        # Multi-host: only process 0 writes scalar/histogram logs (orbax
        # checkpoint saves stay collective — every process participates).
        from ..utils.profiling import MetricLogger

        metric_logger = MetricLogger(checkpoint_dir)

    def run_eval(step):
        variables = {
            "params": state.params,
            **jax.device_get(state.model_state),
        }
        eval_metrics = eval_fn(variables, step)
        logger.info("eval @ %d: %s", step,
                    {k: round(float(v), 4) for k, v in eval_metrics.items()})
        if metric_logger is not None:
            metric_logger.log(
                step, {f"eval/{k}": float(v) for k, v in eval_metrics.items()}
            )

    eval_period = cfg.TEST.EVAL_PERIOD if eval_fn is not None else 0
    batch = first
    t_last = time.time()
    for it in range(start_step, max_iter):
        state, metrics = step_fn(state, shard_batch(mesh, batch))
        if it + 1 < max_iter:
            batch = next(data_iter)
        if (it + 1) % log_every == 0:
            metrics = jax.device_get(metrics)
            dt = (time.time() - t_last) / log_every
            t_last = time.time()
            logger.info(
                "iter %d/%d  %s  (%.3fs/it)",
                it + 1,
                max_iter,
                {k: round(float(v), 4) for k, v in metrics.items()},
                dt,
            )
            if metric_logger is not None:
                metric_logger.log(
                    it + 1,
                    {**{k: float(v) for k, v in metrics.items()}, "sec_per_iter": dt},
                )
                # Per-variable histograms at checkpoint cadence (reference
                # trainer.py:146-155 records every model variable).
                if (it + 1) % max(cfg.SOLVER.SHORT_TERM_SAVE_STEPS, 1) == 0:
                    metric_logger.log_histograms(
                        it + 1, jax.device_get(state.params)
                    )
        if ckpt_mgr is not None:
            ckpt_mgr.save(it + 1, args=_ckpt_args(state))
        if eval_period > 0 and (it + 1) % eval_period == 0 and it + 1 < max_iter:
            run_eval(it + 1)
    if ckpt_mgr is not None and max_iter > start_step:
        # Persist the final state (reference saves at max_iter) — unless we
        # resumed AT max_iter and that step is already on disk.
        if ckpt_mgr.latest_step() != max_iter:
            ckpt_mgr.save(max_iter, args=_ckpt_args(state), force=True)
        ckpt_mgr.wait_until_finished()
    if eval_fn is not None and max_iter > start_step:
        run_eval(max_iter)
    return state


def _ckpt_args(state: TrainState):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(
        {
            "params": state.params,
            "model_state": state.model_state,
            "opt_state": state.opt_state,
            "aux": state.aux,
            "step": state.step,
        }
    )
