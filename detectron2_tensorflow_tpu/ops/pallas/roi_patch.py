"""Pallas TPU kernel: fused ROI patch extraction + bilinear interpolation.

The XLA formulation of patch-based ROIAlign (models/poolers.py) gathers
[N, P, P, C] patches via vmapped dynamic_slice — XLA serializes those slices
with high per-slice overhead (~10 ms/img at production shapes). This kernel
replaces it with the memory system's native operation:

  * grid over ROIs; each step issues ONE strided DMA
    HBM[row:row+P, tx:tx+P, :] -> VMEM (the pyramid levels are
    row-concatenated into one plane by the caller), double-buffered so the next
    ROI's patch streams in while the current one computes;
  * the bilinear interpolation (+ sampling-bin average, folded into the
    weight matrices by the caller) runs on the MXU in-kernel:
    out = Wy (S x P) @ patch (P x PC) then contract the second P with Wx;
  * only the [S, S, C] result is written back — patch bytes never hit HBM
    twice.

ROI coordinates arrive via scalar prefetch so DMA addresses are known before
the kernel body runs. The caller quantizes tx to the sublane tiling (8);
``pl.multiple_of`` asserts it so Mosaic accepts the W-axis HBM slice.

float32 inputs use HIGHEST matmul precision (six-pass) for parity with the
reference math; bfloat16 (the production serving dtype) uses the MXU native
pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Narrow-DMA row tiers: a ROI whose weight-bearing row span fits tier r only
# DMAs r of the patch's rows (models/poolers.plan_rois assigns the class in
# starts[:, 2]). Sorted ascending; the full patch height is appended per call.
ROW_TIERS = (16,)


def _make_kernel(precision, row_tiers):
    def kernel(starts_ref, stacked_ref, wy_ref, wx_ref, out_ref, patch_ref, sem_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        p = patch_ref.shape[1]
        tiers = [r for r in row_tiers if r < p] + [p]

        def dma_for(idx, slot, rows):
            row = starts_ref[idx, 0]
            tx = pl.multiple_of(starts_ref[idx, 1], 8)
            return pltpu.make_async_copy(
                stacked_ref.at[pl.ds(row, rows), pl.ds(tx, p), :],
                patch_ref.at[slot, pl.ds(0, rows)],
                sem_ref.at[slot],
            )

        def tiered(idx, slot, op):
            # The DMA is narrowed to the ROI's weight-bearing row tier
            # (starts[:, 2]); start and wait branch identically so the
            # awaited byte count matches the issued copy.
            cls = starts_ref[idx, 2]
            for k, r in enumerate(tiers):
                @pl.when(cls == k)
                def _(r=r):
                    op(dma_for(idx, slot, r))

        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i == 0)
        def _():
            # Rows beyond a narrowed DMA stay stale in VMEM; their hat
            # weights are exactly zero, but uninitialized VMEM could hold
            # NaN bit patterns (NaN * 0 = NaN) — zero both slots once.
            patch_ref[...] = jnp.zeros_like(patch_ref)
            tiered(0, 0, lambda cp: cp.start())

        @pl.when(i + 1 < n)
        def _():
            tiered(i + 1, next_slot, lambda cp: cp.start())

        tiered(i, slot, lambda cp: cp.wait())

        p = patch_ref.shape[1]
        c = patch_ref.shape[3]
        s = wy_ref.shape[1]
        patch = patch_ref[slot]  # [P, P, C]
        wy = wy_ref[0]  # [S, P]
        wx = wx_ref[0]  # [S, P]

        # a[o, q, c] = sum_p wy[o, p] * patch[p, q, c]
        a = jax.lax.dot_general(
            wy.astype(patch.dtype),
            patch.reshape(p, p * c),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).reshape(s, p, c)
        # out[o, u, c] = sum_q wx[u, q] * a[o, q, c] — contract q, batch o.
        out = jax.lax.dot_general(
            wx.astype(jnp.float32),
            a,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [S(u), S(o), C]
        out = jnp.swapaxes(out, 0, 1)  # [o, u, C]
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


def _make_bwd_kernel(row_tiers):
    def _bwd_kernel(starts_ref, g_ref, wy_ref, wx_ref, zeros_ref, out_ref,
                    patch_ref, outbuf_ref, rsem_ref, wsem_ref):
        """Backward: per-ROI read-modify-write accumulation into the pyramid,
        PIPELINED across grid steps.

        out_ref is HBM (aliased to a zeros input). The sequential grid makes
        the RMW race-free, but a naive read->add->write->wait chain is pure
        DMA latency (the per-ROI matmuls are microseconds). Instead, step i

          * waits write(i-2) (bounds in-flight writes to one and frees the
            outbuf slot about to be reused),
          * prefetches read(i+1) if starts[i+1, 3] (the plan-time hazard
            flag, models/poolers.plan_rois) says ROI i+1's region intersects
            neither ROI i's nor ROI i-1's — the two writes not yet landed,
          * computes gp = Wy^T g Wx^T, accumulates into a SEPARATE output
            buffer (outbuf), and issues write(i) without waiting.

        On a hazard, the step degrades to the serialized order: wait the
        overlapping write(i-1), then read/add/write. Typical train boxes
        hazard ~10-20% of steps, so most read+write latency hides behind
        neighbors. gp[p, q, c] = sum_{o,u} wy[o,p] g[o,u,c] wx[u,q]; the RMW
        window is narrowed to the ROI's weight-bearing row tier (rows beyond
        it have identically-zero gradient).
        """
        del zeros_ref  # aliased into out_ref; presence zero-initializes it
        i = pl.program_id(0)
        n = pl.num_programs(0)
        p = patch_ref.shape[1]
        c = patch_ref.shape[3]
        s = wy_ref.shape[1]
        tiers = [r for r in row_tiers if r < p] + [p]

        def read_for(idx, slot, rows):
            row = starts_ref[idx, 0]
            tx = pl.multiple_of(starts_ref[idx, 1], 8)
            return pltpu.make_async_copy(
                out_ref.at[pl.ds(row, rows), pl.ds(tx, p), :],
                patch_ref.at[slot, pl.ds(0, rows)],
                rsem_ref.at[slot],
            )

        def write_for(idx, slot, rows):
            row = starts_ref[idx, 0]
            tx = pl.multiple_of(starts_ref[idx, 1], 8)
            return pltpu.make_async_copy(
                outbuf_ref.at[slot, pl.ds(0, rows)],
                out_ref.at[pl.ds(row, rows), pl.ds(tx, p), :],
                wsem_ref.at[slot],
            )

        def tiered(idx, fn):
            # Branch start/wait identically by the ROI's row tier so the
            # awaited byte count always matches the issued copy.
            cls = starts_ref[idx, 2]
            for k, r in enumerate(tiers):
                @pl.when(cls == k)
                def _(r=r):
                    fn(r)

        slot = jax.lax.rem(i, 2)
        nslot = jax.lax.rem(i + 1, 2)
        haz_i = starts_ref[i, 3]
        haz_prev = starts_ref[jnp.maximum(i - 1, 0), 3]

        # (1) write(i-2) used wsem[slot] and reads from outbuf[slot], which
        # this step overwrites — it must land first. Already consumed if
        # step i-1 took the hazard path.
        @pl.when((i >= 2) & (haz_prev == 0))
        def _():
            tiered(i - 2, lambda r: write_for(i - 2, slot, r).wait())

        # (2) hazard-free prefetch of the next ROI's read.
        nxt = jnp.minimum(i + 1, n - 1)

        @pl.when((i + 1 < n) & (starts_ref[nxt, 3] == 0))
        def _():
            tiered(nxt, lambda r: read_for(nxt, nslot, r).start())

        # (3) the patch gradient (MXU; microseconds at these shapes)
        g = g_ref[0].astype(jnp.float32)  # [S, S, C]
        wy = wy_ref[0]  # [S, P]
        wx = wx_ref[0]
        # t[p, u, c] = sum_o wy[o, p] * g[o, u, c]
        t = jax.lax.dot_general(
            wy, g.reshape(s, s * c),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(p, s, c)
        # gp[q, p, c] = sum_u wx[u, q] * t[p, u, c]
        gp = jax.lax.dot_general(
            wx, t,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Q(P), P, C]
        gp = jnp.swapaxes(gp, 0, 1)  # [P, Q, C]

        # (4) hazard: read(i) was not prefetched; the overlapping write(i-1)
        # must land before reading (write(i-2) landed in (1)).
        @pl.when(haz_i == 1)
        def _():
            @pl.when(i >= 1)
            def _():
                tiered(i - 1, lambda r: write_for(i - 1, nslot, r).wait())
            tiered(i, lambda r: read_for(i, slot, r).start())

        # (5) accumulate into outbuf and issue the write-back; its wait
        # happens at step i+2 (or in the drain below).
        def finish(r):
            read_for(i, slot, r).wait()
            outbuf_ref[slot, pl.ds(0, r)] = (
                patch_ref[slot, pl.ds(0, r)] + gp[:r]
            )
            write_for(i, slot, r).start()

        tiered(i, finish)

        # (6) drain: the grid (or this image's slice of a vmapped grid) ends
        # with write(i-1) [unless (4) consumed it] and write(i) in flight.
        @pl.when(i == n - 1)
        def _():
            @pl.when((i >= 1) & (haz_i == 0))
            def _():
                tiered(i - 1, lambda r: write_for(i - 1, nslot, r).wait())
            tiered(i, lambda r: write_for(i, slot, r).wait())

    return _bwd_kernel


@functools.partial(jax.jit, static_argnames=("out_shape", "interpret"))
def roi_patch_backward(g, starts, wy, wx, out_shape, interpret=False):
    """Accumulate per-ROI patch gradients into a fresh f32 pyramid."""
    n, s, p = wy.shape
    c = out_shape[-1]
    zeros = jnp.zeros(out_shape, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, s, c), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, s, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, s, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, p, p, c), jnp.float32),  # read slots
            pltpu.VMEM((2, p, p, c), jnp.float32),  # write-back slots
            pltpu.SemaphoreType.DMA((2,)),  # read sems
            pltpu.SemaphoreType.DMA((2,)),  # write sems
        ],
    )
    return pl.pallas_call(
        _make_bwd_kernel(ROW_TIERS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        input_output_aliases={4: 0},  # zeros input (after scalar prefetch)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, g.astype(jnp.float32), wy, wx, zeros)


@jax.custom_vjp
def roi_patch_interpolate_diff(stacked, starts, wy, wx):
    """Differentiable wrapper: Pallas forward, XLA scatter-add backward.

    Gradients flow to ``stacked`` only (ROI boxes are stop-gradient in the
    R-CNN training semantics, so wy/wx/starts get zeros).
    """
    return roi_patch_interpolate(stacked, starts, wy, wx)


def _fwd(stacked, starts, wy, wx):
    # The zero template carries shape/dtype into bwd (residual leaves must be
    # JAX types); XLA folds it away.
    template = jnp.zeros_like(stacked)
    return roi_patch_interpolate(stacked, starts, wy, wx), (
        template,
        starts,
        wy,
        wx,
    )


def _bwd(res, g):
    template, starts, wy, wx = res
    shape, dtype = template.shape, template.dtype
    acc = roi_patch_backward(g, starts, wy, wx, out_shape=tuple(shape))
    return acc.astype(dtype), None, None, None


roi_patch_interpolate_diff.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def roi_patch_interpolate(
    stacked: jnp.ndarray,  # [Htot, Wm, C] row-concatenated pyramid
    starts: jnp.ndarray,  # [N, 4] int32 (row, tx, row-tier, bwd hazard)
    wy: jnp.ndarray,  # [N, S, P] f32 bin-averaged hat weights
    wx: jnp.ndarray,  # [N, S, P]
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [N, S, S, C] pooled features in stacked's dtype."""
    n, s, p = wy.shape
    c = stacked.shape[-1]
    # HIGHEST (six-pass) inside Mosaic hangs compilation at these shapes;
    # float32 callers route to the XLA path instead (models/poolers.py), so
    # this kernel always runs native MXU precision.
    precision = jax.lax.Precision.DEFAULT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stacked stays in HBM
            pl.BlockSpec((1, s, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, s, p), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, s, c), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, p, p, c), stacked.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _make_kernel(precision, ROW_TIERS),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, s, s, c), stacked.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                1.2 * (2 * p * p * c + 2 * s * p + s * s * c)
                * stacked.dtype.itemsize
                + 2 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(starts, stacked, wy, wx)
