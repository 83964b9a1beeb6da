"""Benchmark: Mask R-CNN R50-FPN inference images/sec on one chip.

Prints the inference JSON line {"metric", "value", "unit", "vs_baseline"}
AS SOON AS it is measured (flushed — un-losable under a driver timeout),
then, budget permitting, a second line with train_* keys added; the driver
takes the last parseable line.
Baseline: Detectron2 model zoo Mask R-CNN R50-FPN 1x on V100 = 0.043 s/im
(23.3 img/s); the north-star goal is >= 2x that per chip (BASELINE.md).

Runs at the COCO serving shape (800x1344 bucket), bf16 trunk, batched to
saturate the chip; reports per-image throughput.

Resilience: the TPU worker behind this host's tunnel occasionally faults and
needs minutes to restart, which would otherwise turn a whole bench run into
one exception. The top-level driver therefore runs each measurement in a
SUBPROCESS (a crashed worker poisons the parent's JAX client) and retries
down a ladder of batch sizes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

V100_BASELINE_IMG_S = 23.3
# Lead with batch 32: 48 peaks ~1% higher when it works but reproducibly
# faults this host's TPU worker (~5 min restart) — the driver's captured
# number must be the deterministic one, not the lottery ticket.
BATCH_LADDER = (32, 16, 8)
RECOVERY_SECONDS = 210


def bench_cfg():
    """The benchmark model config (shared with tools/profile_infer.py)."""
    from detectron2_tensorflow_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.NECK.NAME = "FPN"
    cfg.MODEL.NECK.IN_FEATURES = ["res2", "res3", "res4", "res5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.RPN.IN_FEATURES = ["p2", "p3", "p4", "p5", "p6"]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 1000
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_MASK_HEAD.NUM_CONV = 4
    cfg.TEST.DETECTIONS_PER_IMAGE = 100
    return cfg


def _enable_compile_cache():
    """Persistent XLA compilation cache: the detector graph takes 20-40s to
    compile cold; warm bench subprocesses skip it entirely, so the driver's
    measurement window is dominated by steady-state throughput."""
    import jax

    path = os.path.expanduser("~/.cache/detectron2_tensorflow_tpu/xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass


# Dense bf16 peak FLOP/s per chip by device kind (public TPU specs); used
# only for the MFU diagnostic on the bench line. Unknown kinds report no MFU.
_PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 394e12,
    "TPU v5e": 394e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _mfu(compiled, img_s: float, batch_size: int):
    """Model FLOPs utilization: XLA's own flop count for the compiled
    program / measured wall time / chip bf16 peak (VERDICT r2 missing #4).

    This is a LOWER bound on hardware utilization: cost_analysis counts
    algorithmic flops only (no padding/layout work), and detector inference
    spends real time in gather/NMS/DMA phases that do no MXU flops.
    """
    import jax

    try:
        flops = float(compiled.cost_analysis()["flops"])
        kind = jax.devices()[0].device_kind
        peak = next(
            (v for k, v in _PEAK_BF16_FLOPS.items() if k.lower() in kind.lower()),
            None,
        )
        if peak is None or flops <= 0:
            return None
        return round(flops / batch_size * img_s / peak, 4)
    except Exception:  # noqa: BLE001 — diagnostic only, never kill the bench
        return None


def measure(batch_size: int):
    import jax
    import jax.numpy as jnp

    from detectron2_tensorflow_tpu.models import build_model

    _enable_compile_cache()

    model = build_model(bench_cfg())

    h, w = 800, 1344  # COCO shortest-side-800 landscape bucket
    batch = {
        "image": jnp.full((batch_size, h, w, 3), 110.0, jnp.float32),
        "image_size": jnp.tile(jnp.array([[800, 1333]], jnp.int32), (batch_size, 1)),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    predict = jax.jit(model.predict)
    try:  # MFU diagnostic only — never let lowering quirks kill the bench
        compiled = predict.lower(variables, batch).compile()
    except Exception:  # noqa: BLE001
        compiled = None

    def sync(o):
        # NOTE: jax.block_until_ready is a no-op over this host's axon TPU
        # tunnel; a device->host fetch of a scalar is the reliable barrier.
        return float(jax.device_get(o.scores.sum()))

    out = predict(variables, batch)  # compile
    sync(out)

    # Timed runs: dispatch the whole queue, then one sync (in-order device
    # execution makes the final fetch wait for everything). Best-of-3
    # windows: the first window after compile occasionally carries leftover
    # host/tunnel jitter; the max is the stable number (VERDICT r2 weak #1).
    iters = 20
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = predict(variables, batch)
        sync(out)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * iters / dt)
    img_s = best

    record = {
        "metric": "maskrcnn_r50_fpn_inference_images_per_sec_per_chip",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / V100_BASELINE_IMG_S, 3),
    }
    mfu = _mfu(compiled, img_s, batch_size) if compiled is not None else None
    if mfu is not None:
        record["mfu"] = mfu
    print(json.dumps(record))


def _first_json_line(stdout: str):
    return next(
        (ln for ln in stdout.splitlines() if ln.startswith('{"metric"')),
        None,
    )


# --- deadline-safe driver (VERDICT r4 weak #1 / missing #2) ----------------
#
# Round 4's driver bench timed out with ZERO output (BENCH_r04.json rc=124,
# tail ""): the single JSON line printed only after up to ~8,000 s of ladder
# + train attempts. The protocol is now:
#   1. A hard total-wall deadline (D2TPU_BENCH_DEADLINE, default 1800 s).
#      Every per-attempt timeout and recovery sleep is clamped to what's left.
#   2. The inference-only JSON line is printed AND FLUSHED the moment the
#      first ladder attempt succeeds — a later kill can no longer lose it.
#   3. The train-augmented record prints as a SECOND line; the driver takes
#      the last parseable line, so it upgrades the first when it lands.
#
# Measured walls on this host's tunneled v5e (round 5): a fresh inference
# child takes ~4-6 min end to end; a fresh TRAIN child takes ~12-30 min,
# almost all of it in the backend's compile/load of the 46 MB step
# executable — the axon tunnel re-does server-side work even on a
# persistent-cache HIT, so "warm" never means fast for the train graph.
# Hence: the inference ladder gets tight per-attempt timeouts, while the
# train leg gets EVERYTHING still left under the deadline (its line is
# pure upside — the inference line is already flushed).

DEADLINE_SECONDS = float(os.environ.get("D2TPU_BENCH_DEADLINE", "1800"))
ATTEMPT_TIMEOUT = float(os.environ.get("D2TPU_BENCH_ATTEMPT_TIMEOUT", "540"))
_MIN_ATTEMPT = 60.0  # less than this left -> not worth launching a child


def _infer_cmd(batch_size: int):
    return [sys.executable, os.path.abspath(__file__), str(batch_size)]


def _train_cmd(batch_size: int):
    return [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_train.py"),
        str(batch_size),
    ]


def _attempt(cmd, timeout: float):
    """Run one measurement subprocess; return its JSON line or None."""
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        # A child that measured + printed its line and THEN hung (wedged
        # TPU runtime at teardown — this host's signature failure) still
        # delivered the measurement: scan the captured partial stdout.
        out = e.stdout or b""
        if isinstance(out, bytes):
            out = out.decode("utf-8", "replace")
        line = _first_json_line(out)
        if line:
            sys.stderr.write(
                f"bench child hung after printing its line ({timeout:.0f}s): "
                f"{cmd}; using the captured measurement\n"
            )
            return line
        sys.stderr.write(f"bench child timed out after {timeout:.0f}s: {cmd}\n")
        return None
    line = _first_json_line(proc.stdout)
    if proc.returncode == 0 and line:
        return line
    tail = proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else "?"
    sys.stderr.write(f"bench child failed (rc={proc.returncode}); tail: {tail}\n")
    return None


def main():
    t_start = time.monotonic()

    def left():
        return DEADLINE_SECONDS - (time.monotonic() - t_start)

    line = None
    for attempt, bs in enumerate(BATCH_LADDER):
        if left() < _MIN_ATTEMPT:
            break
        line = _attempt(_infer_cmd(bs), min(ATTEMPT_TIMEOUT, left()))
        if line:
            break
        if attempt + 1 < len(BATCH_LADDER) and left() > _MIN_ATTEMPT:
            # let a faulted TPU worker restart, within budget
            time.sleep(max(0.0, min(RECOVERY_SECONDS, left() - _MIN_ATTEMPT)))
    if line is None:
        raise SystemExit("all bench attempts failed within the deadline")

    record = json.loads(line)
    print(json.dumps(record), flush=True)  # the un-losable inference line

    # Companion training-step throughput, appended as extra keys on a SECOND
    # line (the driver takes the last parseable line). Batch ladder: 16 is
    # the measured sweet spot on v5e-1, 8 the safe fallback. The train child
    # gets the whole remaining budget (see the wall-time note above).
    train_ladder = (16, 8)
    for attempt, train_batch in enumerate(train_ladder):
        if left() < _MIN_ATTEMPT:
            break
        tline = _attempt(_train_cmd(train_batch), max(1.0, left() - 15.0))
        if tline:
            t = json.loads(tline)
            record["train_images_per_sec_per_chip"] = t["value"]
            record["train_vs_baseline"] = t["vs_baseline"]
            record["train_batch"] = train_batch
            print(json.dumps(record), flush=True)
            break
        if attempt + 1 < len(train_ladder) and left() > _MIN_ATTEMPT:
            # recovery window only when another attempt will follow
            time.sleep(max(0.0, min(RECOVERY_SECONDS, left() - _MIN_ATTEMPT)))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        measure(int(sys.argv[1]))
    else:
        main()
