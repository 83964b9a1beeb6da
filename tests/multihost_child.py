"""Child process for tests/test_multihost.py.

Usage: python multihost_child.py <pid> <port> — pid >= 0 joins a 2-process
jax.distributed run (4 CPU devices per process, 8 global); pid == -1 runs
the identical computation single-process on 8 devices (the reference).
Prints one JSON line of step metrics.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 if pid < 0 else 4)
    # Persistent compile cache for the SINGLE-process reference child only
    # (same dir as tests/conftest.py): its step compile dominates the serial
    # tail of the test. The 2-process children must NOT use it — measured on
    # this 1-core host, a cache hit lets one peer sprint to its first
    # collective while the other still compiles, blowing Gloo's 30 s
    # key-value handshake deadline (flaky DEADLINE_EXCEEDED).
    if pid < 0:
        _cache = os.path.expanduser(
            "~/.cache/detectron2_tensorflow_tpu/xla-tests"
        )
        try:
            os.makedirs(_cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", _cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
        except (OSError, AttributeError, ValueError):
            pass
    if pid >= 0:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=2, process_id=pid
        )
        assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from detectron2_tensorflow_tpu.engine import (
        build_train_step,
        create_train_state,
    )
    from detectron2_tensorflow_tpu.models import build_model
    from detectron2_tensorflow_tpu.parallel import (
        create_mesh,
        replicate,
        shard_batch,
    )

    mesh = create_mesh(8, 1)
    cfg = _flagship_cfg(tiny=True)
    cfg.SOLVER.IMS_PER_BATCH = 8
    model = build_model(cfg)

    g = 4
    rng = np.random.default_rng(0)

    def global_batch():
        b, h, w = 8, 64, 64
        boxes = np.zeros((b, g, 4), np.float32)
        boxes[..., :2] = rng.uniform(2, 20, (b, g, 2))
        boxes[..., 2:] = boxes[..., :2] + rng.uniform(8, 30, (b, g, 2))
        return {
            "image": rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32),
            "image_size": np.tile(np.array([[h, w]], np.int32), (b, 1)),
            "gt_boxes": boxes,
            "gt_classes": rng.integers(0, 5, (b, g)).astype(np.int32),
            "gt_valid": np.ones((b, g), bool),
            "gt_is_crowd": np.zeros((b, g), bool),
            "gt_masks": rng.uniform(0, 1, (b, g, 28, 28)).astype(np.float32),
        }

    def local(batch):
        if pid < 0:
            return batch
        sl = slice(pid * 4, pid * 4 + 4)
        return {k: v[sl] for k, v in batch.items()}

    first = global_batch()
    state = create_train_state(
        cfg, model, jax.random.PRNGKey(0), local(first)
    )
    state = replicate(mesh, state)
    step_fn = build_train_step(cfg, model, state.params, mesh)

    out = []
    batch = first
    for _ in range(2):
        state, metrics = step_fn(state, shard_batch(mesh, local(batch)))
        out.append({k: float(v) for k, v in jax.device_get(metrics).items()})
        batch = global_batch()
    print("METRICS " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
