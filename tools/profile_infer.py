"""Profile Mask R-CNN inference on the attached chip and print a per-phase
device-time table.

The tensorboard_plugin_profile xplane converters are broken on this host
(protobuf mismatch), so this parses the Chrome-trace JSON the profiler also
emits (vm.trace.json.gz) and aggregates device-lane event durations by
fusion/op name.

Usage: python tools/profile_infer.py [BATCH] [--train]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import tempfile
from collections import defaultdict


def run_trace(batch_size: int, train: bool) -> str:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")

    if train:
        from bench_train import make_train_batch, train_cfg
        from detectron2_tensorflow_tpu.engine import (
            build_train_step,
            create_train_state,
        )
        from detectron2_tensorflow_tpu.models import build_model

        cfg = train_cfg(batch_size)
        model = build_model(cfg)
        batch = make_train_batch(cfg)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        step = build_train_step(cfg, model, state.params)
        state, metrics = step(state, batch)
        float(jax.device_get(metrics["total_loss"]))

        logdir = tempfile.mkdtemp(prefix="train_trace_")
        with jax.profiler.trace(logdir):
            for _i in range(3):
                state, metrics = step(state, batch)
            float(jax.device_get(metrics["total_loss"]))
        return logdir

    from detectron2_tensorflow_tpu.models import build_model

    import os

    head = os.environ.get("PROFILE_HEAD", "")
    if head:  # any tools/bench_heads.py head name
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from bench_heads import HEADS

        from detectron2_tensorflow_tpu.config import get_cfg

        path, (h, w), _ = HEADS[head]
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), path))
        cfg.MODEL.DTYPE = "bfloat16"
        if cfg.MODEL.ROI_HEADS.NUM_CLASSES <= 0:
            cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
        if cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES <= 0:
            cfg.MODEL.SINGLE_STAGE_HEAD.NUM_CLASSES = 80
    else:
        from bench import bench_cfg

        cfg = bench_cfg()
        h, w = 800, 1344
    model = build_model(cfg)
    batch = {
        "image": jnp.full((batch_size, h, w, 3), 110.0, jnp.float32),
        "image_size": jnp.tile(
            jnp.array([[800, 1333]], jnp.int32), (batch_size, 1)
        ),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    fn = jax.jit(model.predict)
    out = fn(variables, batch)
    float(jax.device_get(out.scores.sum()))

    logdir = tempfile.mkdtemp(prefix="infer_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn(variables, batch)
        float(jax.device_get(out.scores.sum()))
    return logdir


def aggregate(logdir: str, batch: int, iters: int = 3):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {logdir}"
    tr = json.loads(gzip.decompress(open(paths[0], "rb").read()))
    events = tr["traceEvents"] if isinstance(tr, dict) else tr

    # Device lanes: pid whose process_name metadata mentions the TPU device
    # (not "Host threads" / python).
    meta = defaultdict(dict)
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            meta[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in meta.items()
        if ("/device" in n or "TPU" in n or "XLA" in n.upper())
        and "Host" not in n
    }
    if not device_pids:  # fall back: lane with the most complete events
        counts = defaultdict(int)
        for e in events:
            if e.get("ph") == "X":
                counts[e["pid"]] += 1
        device_pids = {max(counts, key=counts.get)}

    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        total += dur

    per_img = total / iters / batch
    print(f"device total {total:.1f} ms  ({per_img:.3f} ms/img "
          f"at batch {batch} x {iters} iters)\n")
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in rows[:45]:
        print(f"{dur/iters/batch:8.4f} ms/img  {100*dur/total:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 32
    logdir = run_trace(batch, "--train" in sys.argv)
    print("trace:", logdir)
    aggregate(logdir, batch)
