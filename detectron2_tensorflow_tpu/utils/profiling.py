"""Profiling and metric-logging utilities.

The reference's observability is TensorBoard summaries + 10-step loss prints
(SURVEY §5); TPU-native equivalents:

  * :func:`trace` — a context manager around ``jax.profiler`` producing
    TensorBoard-viewable XPlane traces of device execution;
  * :class:`MetricLogger` — JSONL metric stream (always) + TensorBoard
    scalars via tf.summary when TensorFlow is importable;
  * :class:`StepTimer` — EMA step timing with images/sec.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device profile: ``with trace("/tmp/profile"): step()``."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricLogger:
    """Append-only JSONL metrics + optional TensorBoard scalars."""

    def __init__(self, logdir: str, tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:  # noqa: BLE001 — TB is best-effort
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def log_histograms(self, step: int, params, prefix: str = "params") -> None:
        """Per-variable weight histograms (reference trainer.py:146-155
        model-variable summaries), flattened by parameter path."""
        if self._tb is None:
            return
        import jax
        import numpy as np
        import tensorflow as tf

        with self._tb.as_default():
            flat, _ = jax.tree_util.tree_flatten_with_path(params)
            for path, leaf in flat:
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                tf.summary.histogram(
                    f"{prefix}/{name}", np.asarray(leaf), step=int(step)
                )

    def log_image(self, step: int, tag: str, image) -> None:
        """Write an annotated image summary (EVAL.MAX_EXAMPLE_TO_DRAW path —
        reference evaluation.py:288-297 image summaries)."""
        if self._tb is None:
            return
        import numpy as np
        import tensorflow as tf

        with self._tb.as_default():
            tf.summary.image(tag, np.asarray(image)[None], step=int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """EMA of step latency; reports steps/sec and images/sec."""

    def __init__(self, batch_size: int, momentum: float = 0.95):
        self.batch_size = batch_size
        self.momentum = momentum
        self._last: Optional[float] = None
        self.ema: Optional[float] = None

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        out: Dict[str, float] = {}
        if self._last is not None:
            dt = now - self._last
            self.ema = (
                dt
                if self.ema is None
                else self.momentum * self.ema + (1 - self.momentum) * dt
            )
            out = {
                "step_time_s": self.ema,
                "steps_per_sec": 1.0 / self.ema,
                "images_per_sec": self.batch_size / self.ema,
            }
        self._last = now
        return out
