"""Microbench of the Pallas ROI patch kernel in isolation (real TPU).

Times roi_patch_interpolate at the production box-pooler shape
(B=32, N=1000, P=32, C=256, S=14) plus variants, to attribute the per-ROI
cost between DMA, MXU matmuls, and per-step sequencing overhead.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from detectron2_tensorflow_tpu.ops.pallas import roi_patch


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jnp.sum(out[0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jnp.sum(out[0, 0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    b, n, p, c, s = 32, 1000, 32, 256, 14
    htot, wm = 402, 344  # realistic row-concatenated plane (levels 2..5 + tiers)
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    stacked = jax.random.normal(k1, (b, htot, wm, c), jnp.bfloat16)
    rows = jax.random.randint(k2, (b, n), 0, htot - p)
    txs = (jax.random.randint(k3, (b, n), 0, (wm - p) // 8 + 1) * 8).astype(jnp.int32)
    # Tier mix roughly matching measured spans: 60% smallest, 30% mid, 10% full
    u = jax.random.uniform(k4, (b, n))
    n_combos = len(roi_patch.tier_combos(p))
    cls = jnp.where(u < 0.6, 0, jnp.where(u < 0.9, n_combos // 2, n_combos - 1))
    starts = jnp.stack([rows, txs, cls.astype(jnp.int32)], axis=2)
    wy = jax.random.uniform(k1, (b, n, s, p), jnp.float32)
    wx = jax.random.uniform(k2, (b, n, s, p), jnp.float32)

    fn = jax.jit(lambda *a: roi_patch.roi_patch_interpolate(*a))
    dt = timeit(fn, stacked, starts, wy, wx)
    print(
        f"group={roi_patch.FWD_GROUP}  {dt * 1e3:7.3f} ms/batch  "
        f"{dt / b * 1e3:6.3f} ms/img  {dt / (b * n) * 1e9:7.1f} ns/ROI"
    )

    # All-smallest-tier variant: isolates DMA byte dependence
    starts_small = starts.at[..., 2].set(0)
    dt = timeit(fn, stacked, starts_small, wy, wx)
    print(f"all-min-tier  {dt * 1e3:7.3f} ms/batch  {dt / (b * n) * 1e9:7.1f} ns/ROI")

    # All-full-tier variant
    starts_full = starts.at[..., 2].set(n_combos - 1)
    dt = timeit(fn, starts=None) if False else timeit(fn, stacked, starts_full, wy, wx)
    print(f"all-full-tier {dt * 1e3:7.3f} ms/batch  {dt / (b * n) * 1e9:7.1f} ns/ROI")


if __name__ == "__main__":
    main()
