"""Ablate the ROI kernel's compute body to find the per-ROI cost (TPU).

Variants:
  full   — both matmuls + swapaxes (mirrors production kernel)
  noswap — both matmuls, write [u, o, c] without the final swapaxes
  m1only — first matmul only; out = rows of `a` (wrong numerics, same shapes)
  nodot  — no matmuls; out = a patch slice cast
  nowrite— both matmuls, write a constant (isolates output DMA)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

GROUP = 4


def make_kernel(variant, s, p, c):
    def kernel(starts_ref, stacked_ref, wy_ref, wx_ref, out_ref, patch_ref, sem_ref):
        b = pl.program_id(0)
        j = pl.program_id(1)
        nq = pl.num_programs(1)
        group = GROUP

        def dma_for(jg, k, slot):
            idx = jg * group + k
            row = starts_ref[0, b, idx]
            tx = pl.multiple_of(starts_ref[1, b, idx], 8)
            return pltpu.make_async_copy(
                stacked_ref.at[b, pl.ds(row, p), pl.ds(tx, p), :],
                patch_ref.at[slot, k],
                sem_ref.at[slot, k],
            )

        if variant == "nodma":
            # No input DMA at all: isolates grid + output-pipeline cost.
            for k in range(group):
                out_ref[0, k] = jnp.full((s, s, c), 1.0, out_ref.dtype)
            return
        if variant == "onedma":
            # ONE fused DMA for the whole group's patches: the 4 group
            # members' rows are adjacent in this variant's starts, so copy
            # a [P, group*P] window in a single descriptor.
            row = starts_ref[0, b, j * group]
            tx = pl.multiple_of(starts_ref[1, b, j * group], 8)
            cp = pltpu.make_async_copy(
                stacked_ref.at[b, pl.ds(row, p), pl.ds(tx, p), :],
                patch_ref.at[0, 0],
                sem_ref.at[0, 0],
            )
            cp.start()
            cp.wait()
            for k in range(group):
                out_ref[0, k] = jnp.full((s, s, c), patch_ref[0, 0, 0, 0, 0], out_ref.dtype)
            return

        @pl.when(j == 0)
        def _():
            for k in range(group):
                dma_for(0, k, 0).start()

        @pl.when(j + 1 < nq)
        def _():
            for k in range(group):
                dma_for(j + 1, k, jax.lax.rem(j + 1, 2)).start()

        slot = jax.lax.rem(j, 2)
        for k in range(group):
            dma_for(j, k, slot).wait()

        for k in range(group):
            patch = patch_ref[slot, k]
            wy = wy_ref[0, k]
            wx = wx_ref[0, k]
            if variant == "nodot":
                out_ref[0, k] = jnp.broadcast_to(
                    patch[:s, :s], (s, s, c)
                ).astype(out_ref.dtype)
                continue
            a = jax.lax.dot_general(
                wy.astype(patch.dtype), patch.reshape(p, p * c),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(s, p, c)
            if variant == "m1only":
                out_ref[0, k] = a[:, :s].astype(out_ref.dtype)
                continue
            out = jax.lax.dot_general(
                wx.astype(jnp.float32), a,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [u, o, c]
            if variant == "noswap":
                out_ref[0, k] = out.astype(out_ref.dtype)
            elif variant == "nowrite":
                out_ref[0, k] = jnp.full((s, s, c), out[0, 0, 0], out_ref.dtype)
            else:
                out_ref[0, k] = jnp.swapaxes(out, 0, 1).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(stacked, starts, wy, wx, variant):
    bsz, n, s, p = wy.shape
    c = stacked.shape[-1]
    q = n // GROUP
    starts_t = jnp.moveaxis(starts, 2, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, q),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, GROUP, s, p), lambda b, j, *_: (b, j, 0, 0)),
            pl.BlockSpec((1, GROUP, s, p), lambda b, j, *_: (b, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, GROUP, s, s, c), lambda b, j, *_: (b, j, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, GROUP, p, p, c), stacked.dtype),
            pltpu.SemaphoreType.DMA((2, GROUP)),
        ],
    )
    return pl.pallas_call(
        make_kernel(variant, s, p, c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, n, s, s, c), stacked.dtype),
    )(starts_t, stacked, wy, wx)


def main():
    b, n, p, c, s = 32, 1000, 32, 256, 14
    htot, wm = 402, 344
    key = jax.random.PRNGKey(0)
    k1, k2, k3, _ = jax.random.split(key, 4)
    stacked = jax.random.normal(k1, (b, htot, wm, c), jnp.bfloat16)
    rows = jax.random.randint(k2, (b, n), 0, htot - p)
    txs = (jax.random.randint(k3, (b, n), 0, (wm - p) // 8 + 1) * 8).astype(
        jnp.int32
    )
    starts = jnp.stack([rows, txs, jnp.zeros((b, n), jnp.int32)], axis=2)
    wy = jax.random.uniform(k1, (b, n, s, p), jnp.float32)
    wx = jax.random.uniform(k2, (b, n, s, p), jnp.float32)

    for variant in ("nodma", "onedma", "nodot", "full"):
        fn = functools.partial(run, variant=variant)
        out = fn(stacked, starts, wy, wx)
        jax.device_get(jnp.sum(out[0, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = fn(stacked, starts, wy, wx)
        jax.device_get(jnp.sum(out[0, 0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{variant:8s} {dt * 1e3:8.3f} ms/batch  {dt / (b * n) * 1e9:7.1f} ns/ROI")


if __name__ == "__main__":
    main()
