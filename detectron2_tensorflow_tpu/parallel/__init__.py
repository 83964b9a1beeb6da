"""Device mesh + sharding utilities — the entire distributed story.

The reference's distribution layer is 555 lines of in-graph GPU clone
replication plus CPU-side gradient summing (/root/reference/lib/engine/
model_deploy.py) and a raw NCCL all-reduce for SyncBN. On TPU the whole layer
collapses to sharding annotations:

  * one ``jax.sharding.Mesh`` with a ``data`` axis (and a ``model`` axis
    reserved for spatial/model sharding extensions);
  * the batch is sharded over ``data``; params/optimizer state replicated;
  * jit + sharding propagation inserts the gradient all-reduce and the
    global-batch BN moments over ICI — no hand-written collectives;
  * multi-host scale = ``jax.distributed.initialize`` + per-host data feed
    (same annotations, DCN handled by the runtime).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(cfg=None) -> bool:
    """Connect this process to a multi-host run (jax.distributed).

    Coordinates come from ``PARALLEL.COORDINATOR`` / ``NUM_PROCESSES`` /
    ``PROCESS_ID`` when set, else the standard JAX env vars
    (``JAX_COORDINATOR_ADDRESS`` etc. / cloud TPU auto-detection). Returns
    True iff distributed mode was (or already is) initialized. Call BEFORE
    any other jax API touches the backend. Single-host runs are a no-op.

    After initialization ``jax.devices()`` is the GLOBAL device list (the
    mesh spans hosts; XLA routes the data-axis collectives over DCN and
    the intra-host ones over ICI) while each process feeds only its local
    shard of the batch — see :func:`shard_batch`.
    """
    if jax.process_count() > 1:
        return True
    coord = num = pid = None
    if cfg is not None and getattr(cfg.PARALLEL, "COORDINATOR", ""):
        coord = cfg.PARALLEL.COORDINATOR
        num = cfg.PARALLEL.NUM_PROCESSES or None
        pid = cfg.PARALLEL.PROCESS_ID if cfg.PARALLEL.PROCESS_ID >= 0 else None
    elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
        coord = os.environ["JAX_COORDINATOR_ADDRESS"]
        num = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
        pid = (
            int(os.environ["JAX_PROCESS_ID"])
            if "JAX_PROCESS_ID" in os.environ
            else None
        )
    else:
        return False
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=num, process_id=pid
    )
    return jax.process_count() > 1


_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Record the mesh whose jitted programs will trace Pallas kernels.

    GSPMD cannot auto-partition Mosaic custom calls (jax tpu_custom_call
    raises "cannot be automatically partitioned" whenever the lowering
    context spans more than one device) — and the CPU dryrun can't catch
    that, because Pallas routes to XLA paths off-TPU. The ROI kernels
    consult this to wrap their pallas_call in a shard_map over the 'data'
    axis, so each device runs the kernel on its local batch shard; the
    fixed-shape NMS falls back to its XLA sweep under multi-device instead.
    """
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_multidevice_mesh() -> Optional[Mesh]:
    """The registered mesh, or None when absent / single-device."""
    m = _ACTIVE_MESH
    if m is not None and m.devices.size > 1:
        return m
    return None


def get_active_mesh() -> Optional[Mesh]:
    """The registered mesh exactly as set (no device-count filtering) —
    for save/restore around a scoped set_active_mesh."""
    return _ACTIVE_MESH


def create_mesh(data_axis: int = -1, model_axis: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh; ``data_axis=-1`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_axis == -1:
        assert n % model_axis == 0, (n, model_axis)
        data_axis = n // model_axis
    assert data_axis * model_axis == n, (data_axis, model_axis, n)
    arr = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host-side batch pytree onto the mesh, sharded over 'data'.

    Multi-host: each process passes its LOCAL batch slice (global_batch /
    process_count rows); the pieces assemble into one global jax.Array
    without any cross-host copy of the data itself.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    if jax.process_count() > 1:
        # Multi-host device_put requires identical values on every process
        # (true for seeded init / restored checkpoints); assemble the global
        # replicated array from each process's full copy.
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                r, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


# -- tensor (model-axis) sharding ----------------------------------------------

MIN_SHARD_PARAM_SIZE = 1 << 16  # below this, replication is cheaper than
# the all-gather/collective traffic sharding would add


def leaf_sharding(mesh: Mesh, x) -> NamedSharding:
    """Shape rule for model-axis tensor sharding of one array.

    Kernels (ndim >= 2) split their LAST axis (output features for both
    HWIO convs and [in, out] FC weights) over ``model`` when it divides
    evenly and the tensor is large enough to pay for itself; everything
    else (biases, norm scales, scalars, BN stats) replicates. XLA's SPMD
    partitioner propagates the resulting output-channel sharding through
    the network and inserts the collectives — Megatron-style column
    parallelism without per-layer annotations.
    """
    model = mesh.shape["model"]
    shape = getattr(x, "shape", ())
    if (
        model > 1
        and len(shape) >= 2
        and shape[-1] % model == 0
        and int(np.prod(shape)) >= MIN_SHARD_PARAM_SIZE
    ):
        return NamedSharding(
            mesh, P(*([None] * (len(shape) - 1) + ["model"]))
        )
    return NamedSharding(mesh, P())


def state_shardings(mesh: Mesh, tree: Any) -> Any:
    """Sharding pytree for a TrainState (or any param/opt tree): the leaf
    shape rule applied everywhere. With ``model`` axis size 1 this is
    all-replicated (the data-parallel-only configuration)."""
    return jax.tree.map(lambda x: leaf_sharding(mesh, x), tree)


def shard_state(mesh: Mesh, tree: Any) -> Any:
    """Place a host-side state pytree onto the mesh per state_shardings.

    Multi-host supports the data-parallel configuration (model axis 1 —
    use :func:`replicate`); assembling cross-host model-sharded params
    from full host copies would need per-shard slicing here first."""
    if jax.process_count() > 1 and mesh.shape.get("model", 1) != 1:
        # Reachable from user config (PARALLEL.MODEL_AXIS>1 under
        # jax.distributed) — raise a real error, not an assert.
        raise ValueError(
            "multi-host tensor parallelism is not supported: shard_state "
            "would need per-shard assembly of cross-host model-sharded "
            "params; set PARALLEL.MODEL_AXIS=1 for multi-host runs "
            "(tensor parallelism is single-host only)"
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, leaf_sharding(mesh, x)), tree
    )
