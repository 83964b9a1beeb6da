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


BWD_GROUP = 4  # ROIs accumulated per backward grid step


def _make_bwd_kernel(row_tiers, group):
    def _bwd_kernel(starts_ref, g_ref, wy_ref, wx_ref, zeros_ref, out_ref,
                    patch_ref, outbuf_ref, rsem_ref, wsem_ref):
        """Backward: read-modify-write accumulation into the pyramid,
        GROUP ROIs per sequential grid step.

        out_ref is HBM (aliased to a zeros input); the sequential grid makes
        the RMW race-free. A one-ROI-per-step RMW is dominated by per-step
        sequencing overhead and un-overlapped DMA latency (~17 us/ROI
        measured on v5e — the matmuls are microseconds), so each step
        handles GROUP ROIs: all reads issue back-to-back (latencies
        overlap), each member's accumulate + write-back issues as soon as
        its read lands, and the step ends waiting the writes. The caller
        (roi_patch_backward) orders ROIs so group members are spatially far
        apart; starts[base, 3] == 1 flags the rare group whose members'
        regions DO intersect, which degrades to the fully serialized
        read->add->write chain per member. All semaphores are produced and
        consumed within one step — no cross-step DMA state.

        gp[p, q, c] = sum_{o,u} wy[o,p] g[o,u,c] wx[u,q]; the RMW window is
        narrowed to each ROI's weight-bearing row tier (rows beyond it have
        identically-zero gradient).
        """
        del zeros_ref  # aliased into out_ref; presence zero-initializes it
        j = pl.program_id(0)
        p = patch_ref.shape[1]
        c = patch_ref.shape[3]
        s = wy_ref.shape[1]
        tiers = [r for r in row_tiers if r < p] + [p]
        base = j * group

        def read_for(k, rows):
            row = starts_ref[base + k, 0]
            tx = pl.multiple_of(starts_ref[base + k, 1], 8)
            return pltpu.make_async_copy(
                out_ref.at[pl.ds(row, rows), pl.ds(tx, p), :],
                patch_ref.at[k, pl.ds(0, rows)],
                rsem_ref.at[k],
            )

        def write_for(k, rows):
            row = starts_ref[base + k, 0]
            tx = pl.multiple_of(starts_ref[base + k, 1], 8)
            return pltpu.make_async_copy(
                outbuf_ref.at[k, pl.ds(0, rows)],
                out_ref.at[pl.ds(row, rows), pl.ds(tx, p), :],
                wsem_ref.at[k],
            )

        def tiered(k, fn):
            # Branch start/wait identically by the ROI's row tier so the
            # awaited byte count always matches the issued copy.
            cls = starts_ref[base + k, 2]
            for t_i, r in enumerate(tiers):
                @pl.when(cls == t_i)
                def _(r=r):
                    fn(r)

        def gp_for(k):
            g = g_ref[k].astype(jnp.float32)  # [S, S, C]
            wy = wy_ref[k]  # [S, P]
            wx = wx_ref[k]
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
            return jnp.swapaxes(gp, 0, 1)  # [P, Q, C]

        hazard = starts_ref[base, 3]

        @pl.when(hazard == 0)
        def _():
            for k in range(group):
                tiered(k, lambda r, k=k: read_for(k, r).start())
            for k in range(group):
                gp = gp_for(k)

                def fin(r, k=k, gp=gp):
                    read_for(k, r).wait()
                    outbuf_ref[k, pl.ds(0, r)] = patch_ref[k, pl.ds(0, r)] + gp[:r]
                    write_for(k, r).start()

                tiered(k, fin)
            for k in range(group):
                tiered(k, lambda r, k=k: write_for(k, r).wait())

        @pl.when(hazard == 1)
        def _():
            # Members may hit the same region: strict per-member RMW chain.
            for k in range(group):
                gp = gp_for(k)

                def serial(r, k=k, gp=gp):
                    read_for(k, r).start()
                    read_for(k, r).wait()
                    outbuf_ref[k, pl.ds(0, r)] = patch_ref[k, pl.ds(0, r)] + gp[:r]
                    write_for(k, r).start()
                    write_for(k, r).wait()

                tiered(k, serial)

    return _bwd_kernel


@functools.partial(jax.jit, static_argnames=("out_shape", "interpret"))
def roi_patch_backward(g, starts, wy, wx, out_shape, interpret=False):
    """Accumulate per-ROI patch gradients into a fresh f32 pyramid.

    Accumulation is order-independent, so ROIs are re-ordered for the
    grouped kernel: sort by region (row, tx), then deal the sorted order
    round-robin into BWD_GROUP-member groups — members sit ~n/GROUP sorted
    positions apart, so their regions almost never intersect and the group
    can run its DMAs concurrently. A group whose members DO intersect
    (pairwise [P, P]-window test) is flagged in starts[:, 3] and the kernel
    serializes it. The ROI list is padded to a group multiple with zero-
    gradient dummies aimed at the plane's trailing zero rows.
    """
    n, s, p = wy.shape
    c = out_shape[-1]
    group = BWD_GROUP
    m = -(-n // group) * group
    pad = m - n

    rows = starts[:, 0]
    txs = starts[:, 1]
    cls = starts[:, 2]
    # Sort by region; padding sorts last (key above any real region).
    key = rows * 2048 + txs
    if pad:
        full_cls = len([r for r in ROW_TIERS if r < p])
        key = jnp.concatenate([key, jnp.full((pad,), jnp.int32(2 ** 30))])
        rows = jnp.concatenate(
            [rows, jnp.full((pad,), jnp.int32(out_shape[0] - p))]
        )
        txs = jnp.concatenate([txs, jnp.zeros((pad,), jnp.int32)])
        cls = jnp.concatenate([cls, jnp.full((pad,), jnp.int32(full_cls))])
        g = jnp.concatenate([g, jnp.zeros((pad, s, s, c), g.dtype)])
        wy = jnp.concatenate([wy, jnp.zeros((pad, s, p), wy.dtype)])
        wx = jnp.concatenate([wx, jnp.zeros((pad, s, p), wx.dtype)])
    order = jnp.argsort(key)
    # exec[j*G + k] = order[k*q + j]: group j's members are q apart.
    q = m // group
    exec_order = jnp.swapaxes(order.reshape(group, q), 0, 1).reshape(-1)

    rows = jnp.take(rows, exec_order)
    txs = jnp.take(txs, exec_order)
    cls = jnp.take(cls, exec_order)
    g = jnp.take(g, exec_order, axis=0)  # native dtype; kernel casts to f32
    wy = jnp.take(wy, exec_order, axis=0)
    wx = jnp.take(wx, exec_order, axis=0)

    # Group hazard: any pairwise region overlap among the group's members.
    gr = rows.reshape(q, group)
    gt = txs.reshape(q, group)
    dy = jnp.abs(gr[:, :, None] - gr[:, None, :])
    dx = jnp.abs(gt[:, :, None] - gt[:, None, :])
    pair = (dy < p) & (dx < p)
    pair = pair & ~jnp.eye(group, dtype=bool)[None]
    hazard = jnp.any(pair, axis=(1, 2)).astype(jnp.int32)  # [q]
    starts4 = jnp.stack(
        [rows, txs, cls, jnp.repeat(hazard, group)], axis=1
    )

    zeros = jnp.zeros(out_shape, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q,),
        in_specs=[
            pl.BlockSpec((group, s, s, c), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((group, s, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((group, s, p), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # zeros (aliased to out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((group, p, p, c), jnp.float32),  # read slots
            pltpu.VMEM((group, p, p, c), jnp.float32),  # write-back slots
            pltpu.SemaphoreType.DMA((group,)),  # read sems
            pltpu.SemaphoreType.DMA((group,)),  # write sems
        ],
    )
    return pl.pallas_call(
        _make_bwd_kernel(ROW_TIERS, group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        input_output_aliases={4: 0},  # zeros input (after scalar prefetch)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts4, g, wy, wx, zeros)


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
    starts: jnp.ndarray,  # [N, 3] int32 (row, tx, row-tier); tx multiple of 8
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
