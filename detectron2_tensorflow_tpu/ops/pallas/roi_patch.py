"""Pallas TPU kernel: fused ROI patch extraction + bilinear interpolation.

The XLA formulation of patch-based ROIAlign (models/poolers.py) gathers
[N, P, P, C] patches via vmapped dynamic_slice — XLA serializes those slices
with high per-slice overhead (~10 ms/img at production shapes). This kernel
replaces it with the memory system's native operation:

  * grid over (image, ROI); each step issues ONE strided DMA
    HBM[b, row:row+P, tx:tx+P, :] -> VMEM (the pyramid levels are
    row-concatenated into one plane per image by the caller), double-buffered
    so the next ROI's patch streams in while the current one computes;
  * the bilinear interpolation (+ sampling-bin average, folded into the
    weight matrices by the caller) runs on the MXU in-kernel:
    out = Wy (S x P) @ patch (P x PC) then contract the second P with Wx;
  * only the [S, S, C] result is written back — patch bytes never hit HBM
    twice.

The batch is a NATIVE grid dimension, not jax.vmap: vmap of a pallas_call
with ANY-space operands falls back to a sequential lax.map whose per-image
dynamic_update_slice on the [Htot, Wm, C] f32 gradient plane costs more
than the kernel itself (~6.6 ms/image measured on v5e — the while-loop DUS
dominated the whole pooler backward before this).

ROI coordinates arrive via scalar prefetch so DMA addresses are known before
the kernel body runs. The caller quantizes tx to the sublane tiling (8);
``pl.multiple_of`` asserts it so Mosaic accepts the W-axis HBM slice.

float32 inputs use HIGHEST matmul precision (six-pass) for parity with the
reference math; bfloat16 (the production serving dtype) uses the MXU native
pass.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Narrow-DMA window tiers: a ROI whose weight-bearing row/col span fits a
# tier only DMAs that many patch rows/cols (models/poolers.plan_rois assigns
# the combined class in starts[:, 2] = row_class * n_col_tiers + col_class).
# Sorted ascending; the full patch extent is appended per call. Measured on
# realistic area-rule boxes at P=32: row spans <=16 for 63% / <=24 for 100%,
# col spans (which carry the tx alignment shift) <=16 for 43% / <=24 for 87%
# — 2D tiers cut the RMW backward's HBM window traffic ~40%.
ROW_TIERS = (16, 24)
COL_TIERS = (16, 24)


def tier_combos(p):
    """All (rows, cols) DMA window tiers for patch size ``p``.

    ``starts[:, 2]`` indexes this list; the last entry is the full patch.
    """
    tr = [r for r in ROW_TIERS if r < p] + [p]
    tc = [c for c in COL_TIERS if c < p] + [p]
    return [(r, c) for r in tr for c in tc]


def full_tier_class(p):
    """Class index of the full-patch (un-narrowed) window."""
    return len(tier_combos(p)) - 1


def skip_tier_class(p):
    """Tier-class SENTINEL marking a ROI the kernels skip entirely.

    The per-ROI DMA *issue* cost (~0.7 us on v5e) dominates both kernels,
    and at serving time most of the fixed 1000 proposal slots are NMS
    padding (``is_valid`` false; their outputs are masked by every
    consumer). A sentinel-classed ROI issues NO DMA: the forward writes
    exact zeros to its output block (deterministic — garbage VMEM could
    hold NaNs, and 0 * NaN poisons gradients), and the backward is a
    complete no-op (a masked slot's cotangent is identically zero, so
    skipping its read-modify-write equals adding zero).
    """
    return len(tier_combos(p))


FWD_GROUP = 4  # ROIs interpolated per forward grid step


def _maybe_shard_map(run, in_batch_dims, out_batch_dim):
    """Wrap a kernel launcher in shard_map over the active mesh's 'data'
    axis, so each device runs the Mosaic kernel on its local batch shard.

    GSPMD cannot auto-partition Mosaic custom calls — a multi-device jit
    containing a bare pallas_call fails to lower ("Mosaic kernels cannot be
    automatically partitioned", jax tpu_custom_call.py) — and the virtual-
    CPU multichip dryrun can't surface that, because Pallas routes to XLA
    paths off-TPU. ``in_batch_dims[i]`` names operand i's batch dimension
    (everything else replicates, including any 'model' tensor-parallel
    sharding, which GSPMD re-establishes outside the kernel).
    """
    from ...parallel import active_multidevice_mesh

    mesh = active_multidevice_mesh()
    if mesh is None:
        return run
    from jax.sharding import PartitionSpec as P

    def spec(dim):
        return P(*([None] * dim + ["data"]))

    return jax.shard_map(
        run,
        mesh=mesh,
        in_specs=tuple(spec(d) for d in in_batch_dims),
        out_specs=spec(out_batch_dim),
        check_vma=False,
    )


def _vmem_group(base: int, p: int, c: int, itemsize: int,
                buffers: int = 2, budget: int = 10 * 1024 * 1024) -> int:
    """Cap the per-step ROI group so its patch buffers fit VMEM.

    The scratch holds ``buffers`` planes of [p, p*c] per group member.
    At the FPN serving channels (C=256 bf16) the cap is inactive (group
    stays at ``base``); C4/DC5 pool 1024-channel res4 features whose 2MB
    patches blow the scoped-vmem budget at group 4.
    """
    member = buffers * p * p * c * itemsize
    return max(1, min(base, budget // max(member, 1)))
# Measured on v5e at the production box-pooler shape (B=16, N=1000, P=32,
# C=256, S=7), per ROI slot. The forward is bound by per-member VMEM
# consumption + fixed sequencing, NOT by the HBM DMA:
#   * skipping a member's DMA alone (valid-skip, round 2) saved ~2% — the
#     patch load feeding dot1 always read the full [P, P*C] from VMEM
#     regardless of how narrow the HBM window was (which is why window
#     tiers measured "insensitive" here while paying a 9-way branch tree);
#   * gating the dots + write on the skip sentinel: 1.31 -> 0.66 us/slot
#     at 18/1000 valid (so load+dots are ~half the member cost);
#   * dropping the tier tree for one full-window DMA: all-valid
#     1.31 -> 1.16, skip-heavy 0.66 -> 0.47;
#   * block-diagonal K=128 batching of the group's first dots
#     (FWD_BLOCKDIAG): neutral at all-valid (same VMEM bytes) and 2.5x
#     worse when most slots skip (no per-member compute gate) — keep off.
# Row-tier-sliced dots: MEASURED, a dead end (round-2 session-5). The
# Mosaic reshape-in-region restriction is avoidable — dot_general on the 3D
# [rows, P, C] segment load contracting dim 0 lowers fine inside pl.when —
# but a per-segment f32 [S, P, C] accumulator adds more VMEM traffic than
# the narrowed rows save: at C=1024 (B=8, N=1000, all-real 60/30/10 tier
# mix) 53.1 -> 63.7 ms/batch, at C=256 17.8 -> 22.1. Narrowing ONLY the
# HBM DMA can't help either: the DMA is double-buffered behind the member
# compute, which is the bound (53 ms measured vs 19.5 ms full-window DMA
# roofline at C=1024). Swapping the contraction order (patch @ Wx^T first,
# then Wy — kills the final swapaxes) measured just -4.6% at C=1024 and
# changes bf16 summation order; not worth splitting the code path.
# Narrow tiers DO pay off in the backward, whose read-modify-write traffic
# is 2 HBM DMAs/ROI on f32 planes.
FWD_BLOCKDIAG = False  # worse or neutral on v5e (see above); experiments only


def _make_kernel(group, precision):
    def kernel(starts_ref, stacked_ref, wy_ref, wx_ref, out_ref, patch_ref,
               bd_ref, sem_ref):
        """Forward: GROUP ROIs per grid step, double-buffered across steps.

        One ROI per step leaves the kernel dominated by per-step sequencing
        overhead (~1 us/step on v5e; the matmuls and the tiered DMA are each
        a fraction of that), so each step interpolates GROUP ROIs: the whole
        NEXT group's patch reads are issued back-to-back into the other
        buffer slot while this group computes, and each member's two MXU
        matmuls run as soon as its own read lands.
        """
        b = pl.program_id(0)
        j = pl.program_id(1)
        nq = pl.num_programs(1)
        p = patch_ref.shape[2]
        c = patch_ref.shape[4]
        s = wy_ref.shape[2]
        combos = tier_combos(p)

        def dma_for(jg, k, slot, rows, cols):
            idx = jg * group + k
            row = starts_ref[0, b, idx]
            tx = pl.multiple_of(starts_ref[1, b, idx], 8)
            return pltpu.make_async_copy(
                stacked_ref.at[b, pl.ds(row, rows), pl.ds(tx, cols), :],
                patch_ref.at[slot, k, pl.ds(0, rows), pl.ds(0, cols)],
                sem_ref.at[slot, k],
            )

        def tiered(jg, k, op):
            # Forward DMA policy: ONE full-patch window for every real ROI.
            # The forward is bound by per-member sequencing, not DMA bytes
            # (measured: min tier == full tier per-ROI time), so the 9-way
            # narrow-window branch tree the BACKWARD profits from (RMW =
            # 2 DMAs/ROI on f32 planes) is pure branch overhead here —
            # ~0.15 us/ROI on v5e. A full window is always in bounds: the
            # plane carries P trailing zero rows and tx <= w_max - P.
            # Only the skip sentinel (invalid slot) branches: no DMA.
            cls = starts_ref[2, b, jg * group + k]

            @pl.when(cls < len(combos))
            def _():
                op(p, p)

        @pl.when((b == 0) & (j == 0))
        def _():
            # Rows/cols beyond a narrowed DMA stay stale in VMEM; their hat
            # weights are exactly zero, but uninitialized VMEM could hold
            # NaN bit patterns (NaN * 0 = NaN) — zero both slots once.
            patch_ref[...] = jnp.zeros_like(patch_ref)

        @pl.when(j == 0)
        def _():
            # First group of each image: nothing prefetched it.
            for k in range(group):
                tiered(0, k, lambda r, ct, k=k: dma_for(0, k, 0, r, ct).start())

        @pl.when(j + 1 < nq)
        def _():
            for k in range(group):
                tiered(
                    j + 1, k,
                    lambda r, ct, k=k: dma_for(
                        j + 1, k, jax.lax.rem(j + 1, 2), r, ct
                    ).start(),
                )

        slot = jax.lax.rem(j, 2)
        for k in range(group):
            tiered(j, k, lambda r, ct, k=k: dma_for(j, k, slot, r, ct).wait())

        if group > 1 and FWD_BLOCKDIAG:
            # Per-member dots ([S, P] @ [P, P*C], K = P = 32) run the MXU at
            # a few percent utilization — the 128-deep systolic K axis is
            # mostly padding. Batch the group through ONE matmul with a
            # block-diagonal LHS: [G*S, G*P] @ [G*P, P*C]. The off-diagonal
            # zeros are wasted FLOPs but ride the same MXU passes the
            # padding wasted anyway. The diagonal blocks sit at the same
            # offsets every step, so the scratch is zeroed once and only the
            # blocks are rewritten per step.
            @pl.when((b == 0) & (j == 0))
            def _():
                bd_ref[...] = jnp.zeros_like(bd_ref)

            for k in range(group):
                bd_ref[k * s:(k + 1) * s, k * p:(k + 1) * p] = (
                    wy_ref[0, k].astype(bd_ref.dtype)
                )
            patches = patch_ref[slot].reshape(group * p, p * c)
            a_all = jax.lax.dot_general(
                bd_ref[...],
                patches,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision,
            )  # [G*S, P*C]
            for k in range(group):
                a = a_all[k * s:(k + 1) * s].reshape(s, p, c)
                out = jax.lax.dot_general(
                    wx_ref[0, k].astype(jnp.float32),
                    a,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision,
                )  # [S(u), S(o), C]
                cls_k = starts_ref[2, b, j * group + k]

                @pl.when(cls_k < len(combos))
                def _(k=k, out=out):
                    out_ref[0, k] = jnp.swapaxes(out, 0, 1).astype(out_ref.dtype)

                @pl.when(cls_k >= len(combos))
                def _(k=k):
                    out_ref[0, k] = jnp.zeros_like(out_ref[0, k])
        else:
            for k in range(group):
                # The load + reshape stay OUTSIDE the conditional (Mosaic
                # rejects reshaping a ref load inside a pl.when region);
                # the dots and the write are gated so a sentinel-classed
                # member (skip_tier_class — no DMA was issued; the patch
                # slot is stale) skips its MXU work and writes exact zeros.
                patch2 = patch_ref[slot, k].reshape(p, p * c)  # [P, P*C]
                wy = wy_ref[0, k]  # [S, P]
                wx = wx_ref[0, k]  # [S, P]
                cls_k = starts_ref[2, b, j * group + k]

                @pl.when(cls_k < len(combos))
                def _(k=k, patch2=patch2, wy=wy, wx=wx):
                    # a[o, q, c] = sum_p wy[o, p] * patch[p, q, c]
                    a = jax.lax.dot_general(
                        wy.astype(patch2.dtype),
                        patch2,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    ).reshape(s, p, c)
                    # out[o, u, c] = sum_q wx[u, q] a[o, q, c] — contract q.
                    out = jax.lax.dot_general(
                        wx.astype(jnp.float32),
                        a,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision,
                    )  # [S(u), S(o), C]
                    out_ref[0, k] = jnp.swapaxes(out, 0, 1).astype(out_ref.dtype)

                @pl.when(cls_k >= len(combos))
                def _(k=k):
                    out_ref[0, k] = jnp.zeros_like(out_ref[0, k])

    return kernel


# ROIs accumulated per backward grid step. Larger groups halve the
# sequential step count at the cost of proportionally more scoped VMEM
# and a higher same-region hazard rate. MEASURED (round 5, Mask R-CNN
# R50-FPN train batch 16 on v5e-1): D2TPU_BWD_GROUP=8 regresses the full
# step 52.8 -> 47.7 img/s — the doubled scoped-VMEM footprint (32 MB)
# crowds out the surrounding fusions' buffers; 4 stays the default.
BWD_GROUP = int(os.environ.get("D2TPU_BWD_GROUP", "4"))


def _make_bwd_kernel(group):
    def _bwd_kernel(starts_ref, g_ref, wy_ref, wx_ref, zeros_ref, out_ref,
                    patch_ref, outbuf_ref, rsem_ref, wsem_ref):
        """Backward: read-modify-write accumulation into the pyramid,
        GROUP ROIs per sequential grid step.

        out_ref is HBM (aliased to a zeros input); the sequential grid makes
        the RMW race-free. A one-ROI-per-step RMW is dominated by per-step
        sequencing overhead and un-overlapped DMA latency (the matmuls are
        microseconds), so each step handles GROUP ROIs: all reads issue
        back-to-back (latencies overlap), each member's accumulate +
        write-back issues as soon as its read lands, and the step ends
        waiting the writes. The caller (roi_patch_backward) orders ROIs so
        group members are spatially far apart; starts[b, base, 3] == 1
        flags the rare group whose members' regions DO intersect, which
        degrades to the fully serialized read->add->write chain per member.
        All semaphores are produced and consumed within one step — no
        cross-step DMA state.

        gp[p, q, c] = sum_{o,u} wy[o,p] g[o,u,c] wx[u,q]; the RMW window is
        narrowed to each ROI's weight-bearing (row, col) tier (cells beyond
        it have identically-zero gradient).
        """
        del zeros_ref  # aliased into out_ref; presence zero-initializes it
        b = pl.program_id(0)
        j = pl.program_id(1)
        p = patch_ref.shape[1]
        c = patch_ref.shape[3]
        s = wy_ref.shape[2]
        combos = tier_combos(p)
        base = j * group

        def read_for(k, rows, cols):
            row = starts_ref[0, b, base + k]
            tx = pl.multiple_of(starts_ref[1, b, base + k], 8)
            return pltpu.make_async_copy(
                out_ref.at[b, pl.ds(row, rows), pl.ds(tx, cols), :],
                patch_ref.at[k, pl.ds(0, rows), pl.ds(0, cols)],
                rsem_ref.at[k],
            )

        def write_for(k, rows, cols):
            row = starts_ref[0, b, base + k]
            tx = pl.multiple_of(starts_ref[1, b, base + k], 8)
            return pltpu.make_async_copy(
                outbuf_ref.at[k, pl.ds(0, rows), pl.ds(0, cols)],
                out_ref.at[b, pl.ds(row, rows), pl.ds(tx, cols), :],
                wsem_ref.at[k],
            )

        def tiered(k, fn):
            # Branch start/wait identically by the ROI's window tier so the
            # awaited byte count always matches the issued copy.
            cls = starts_ref[2, b, base + k]
            for t_i, (r, ct) in enumerate(combos):
                @pl.when(cls == t_i)
                def _(r=r, ct=ct):
                    fn(r, ct)

        def gp_for(k):
            g = g_ref[0, k].astype(jnp.float32)  # [S, S, C]
            wy = wy_ref[0, k]  # [S, P]
            wx = wx_ref[0, k]
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

        hazard = starts_ref[3, b, base]

        @pl.when(hazard == 0)
        def _():
            for k in range(group):
                tiered(k, lambda r, ct, k=k: read_for(k, r, ct).start())
            for k in range(group):
                gp = gp_for(k)

                def fin(r, ct, k=k, gp=gp):
                    read_for(k, r, ct).wait()
                    outbuf_ref[k, pl.ds(0, r), pl.ds(0, ct)] = (
                        patch_ref[k, pl.ds(0, r), pl.ds(0, ct)] + gp[:r, :ct]
                    )
                    write_for(k, r, ct).start()

                tiered(k, fin)
            for k in range(group):
                tiered(k, lambda r, ct, k=k: write_for(k, r, ct).wait())

        @pl.when(hazard == 1)
        def _():
            # Members may hit the same region: strict per-member RMW chain.
            for k in range(group):
                gp = gp_for(k)

                def serial(r, ct, k=k, gp=gp):
                    read_for(k, r, ct).start()
                    read_for(k, r, ct).wait()
                    outbuf_ref[k, pl.ds(0, r), pl.ds(0, ct)] = (
                        patch_ref[k, pl.ds(0, r), pl.ds(0, ct)] + gp[:r, :ct]
                    )
                    write_for(k, r, ct).start()
                    write_for(k, r, ct).wait()

                tiered(k, serial)

    return _bwd_kernel


@functools.partial(jax.jit, static_argnames=("out_shape", "interpret"))
def roi_patch_backward(g, starts, wy, wx, out_shape, interpret=False,
                       init=None):
    """Accumulate per-ROI patch gradients into a fresh f32 pyramid.

    Batched: g [B, N, S, S, C], starts [B, N, 3], wy/wx [B, N, S, P],
    out_shape (B, Htot, Wm, C). Unbatched 3-/2-d inputs are promoted to a
    batch of one.

    ``init`` (optional f32 plane of ``out_shape``): accumulate INTO this
    plane instead of a fresh zeros one (the buffer is donated via the
    kernel's input-output alias). Chaining several ROI sets' backwards
    through one accumulator this way deletes a full-plane zeros broadcast
    and a full-plane add per extra set — pure HBM traffic (a 16x600x336x256
    plane is 5.2 GB; see roi_patch_pool_multi).

    Accumulation is order-independent, so ROIs are re-ordered for the
    grouped kernel: sort by region (row, tx), then deal the sorted order
    round-robin into BWD_GROUP-member groups — members sit ~n/GROUP sorted
    positions apart, so their regions almost never intersect and the group
    can run its DMAs concurrently. A group whose members DO intersect
    (pairwise [P, P]-window test) is flagged in starts[..., 3] and the
    kernel serializes it. The ROI list is padded to a group multiple with
    zero-gradient dummies aimed at the plane's trailing zero rows.
    """
    squeeze = g.ndim == 4
    if squeeze:
        g, starts, wy, wx = (x[None] for x in (g, starts, wy, wx))
        out_shape = (1,) + tuple(out_shape)
        if init is not None:
            init = init[None]
    bsz, n, s, p = wy.shape
    c = out_shape[-1]
    # f32 read + write-back slots per member (see scratch_shapes below).
    # Budget scales with the requested group so D2TPU_BWD_GROUP=8 isn't
    # silently re-capped to the default-4 VMEM allowance; the C4/DC5
    # 1024-channel cap still applies proportionally.
    group = _vmem_group(
        BWD_GROUP, p, c, 4, buffers=2,
        budget=10 * 1024 * 1024 * max(1, BWD_GROUP // 4),
    )
    m = -(-n // group) * group
    pad = m - n

    rows = starts[..., 0]
    txs = starts[..., 1]
    cls = starts[..., 2]
    # Sort by region; padding sorts last (key above any real region).
    key = rows * 2048 + txs
    if pad:
        # dummies are sentinel-classed: the kernel issues no DMA for them.
        full_cls = skip_tier_class(p)
        fill = lambda v, shape=(bsz, pad): jnp.full(shape, jnp.int32(v))
        key = jnp.concatenate([key, fill(2 ** 30)], axis=1)
        rows = jnp.concatenate([rows, fill(out_shape[1] - p)], axis=1)
        txs = jnp.concatenate([txs, fill(0)], axis=1)
        cls = jnp.concatenate([cls, fill(full_cls)], axis=1)
        g = jnp.concatenate([g, jnp.zeros((bsz, pad, s, s, c), g.dtype)], 1)
        wy = jnp.concatenate([wy, jnp.zeros((bsz, pad, s, p), wy.dtype)], 1)
        wx = jnp.concatenate([wx, jnp.zeros((bsz, pad, s, p), wx.dtype)], 1)
    order = jnp.argsort(key, axis=1)
    # exec[b, j*G + k] = order[b, k*q + j]: group j's members are q apart.
    q = m // group
    exec_order = jnp.swapaxes(order.reshape(bsz, group, q), 1, 2).reshape(bsz, m)

    take = lambda a: jnp.take_along_axis(
        a, exec_order.reshape((bsz, m) + (1,) * (a.ndim - 2)), axis=1
    )
    rows = jnp.take_along_axis(rows, exec_order, axis=1)
    txs = jnp.take_along_axis(txs, exec_order, axis=1)
    cls = jnp.take_along_axis(cls, exec_order, axis=1)
    g = take(g)  # native dtype; kernel casts to f32
    wy = take(wy)
    wx = take(wx)

    # Group hazard: any pairwise region overlap among the group's members.
    # Sentinel-classed members (skipped slots / pad dummies) issue no DMA
    # at all, so they can never conflict — exclude them or a group of
    # dummies parked on the same trailing rows would serialize for nothing.
    gr = rows.reshape(bsz, q, group)
    gt = txs.reshape(bsz, q, group)
    real = (cls < skip_tier_class(p)).reshape(bsz, q, group)
    dy = jnp.abs(gr[:, :, :, None] - gr[:, :, None, :])
    dx = jnp.abs(gt[:, :, :, None] - gt[:, :, None, :])
    pair = (dy < p) & (dx < p)
    pair = pair & real[:, :, :, None] & real[:, :, None, :]
    pair = pair & ~jnp.eye(group, dtype=bool)[None, None]
    hazard = jnp.any(pair, axis=(2, 3)).astype(jnp.int32)  # [B, q]
    # SMEM layout: [4, B, m] — the per-ROI axis must be LAST (SMEM pads
    # the minor dim to 128 lanes; [B, m, 4] would blow the 1MB budget).
    starts4 = jnp.stack(
        [rows, txs, cls, jnp.repeat(hazard, group, axis=1)], axis=0
    )  # [4, B, m]

    if init is None:
        acc0 = jnp.zeros(out_shape, jnp.float32)
    else:
        assert init.shape == tuple(out_shape) and init.dtype == jnp.float32, (
            init.shape, init.dtype, out_shape)
        acc0 = init

    def run(starts4, g, wy, wx, zeros):
        bsz = g.shape[0]  # LOCAL batch under shard_map
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, q),
            in_specs=[
                pl.BlockSpec(
                    (1, group, s, s, c), lambda b, j, *_: (b, j, 0, 0, 0)
                ),
                pl.BlockSpec((1, group, s, p), lambda b, j, *_: (b, j, 0, 0)),
                pl.BlockSpec((1, group, s, p), lambda b, j, *_: (b, j, 0, 0)),
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
            _make_bwd_kernel(group),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz,) + out_shape[1:], jnp.float32),
            input_output_aliases={4: 0},  # zeros input (after scalar prefetch)
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                # Same fixed-headroom rule as the forward: Mosaic's default
                # scoped limit (~19.5M) is exceeded at the C4 shape (C=1024
                # read+write f32 slots measured 20.2M at group 1).
                vmem_limit_bytes=int(
                    1.35 * (2 * group * p * p * c * 4
                            + 2 * group * s * s * c * g.dtype.itemsize
                            + 4 * group * s * p * 4)
                    + 10 * 1024 * 1024
                ),
            ),
            interpret=interpret,
        )(starts4, g, wy, wx, zeros)

    out = _maybe_shard_map(
        run, in_batch_dims=(1, 0, 0, 0, 0), out_batch_dim=0
    )(starts4, g, wy, wx, acc0)
    return out[0] if squeeze else out


@jax.custom_vjp
def roi_patch_interpolate_diff(stacked, starts, wy, wx):
    """Differentiable wrapper: Pallas forward, Pallas RMW backward.

    Gradients flow to ``stacked`` only (ROI boxes are stop-gradient in the
    R-CNN training semantics, so wy/wx/starts get zeros).
    """
    return roi_patch_interpolate(stacked, starts, wy, wx)


def _fwd(stacked, starts, wy, wx):
    # Zero-width template: carries the plane's leading dims and dtype into
    # bwd statically (residual leaves must be JAX values); XLA folds it away.
    template = jnp.zeros(stacked.shape[:-1] + (0,), stacked.dtype)
    return roi_patch_interpolate(stacked, starts, wy, wx), (
        template,
        starts,
        wy,
        wx,
    )


def _bwd(res, g):
    template, starts, wy, wx = res
    shape = template.shape[:-1] + (g.shape[-1],)
    acc = roi_patch_backward(g, starts, wy, wx, out_shape=shape)
    return acc.astype(template.dtype), None, None, None


roi_patch_interpolate_diff.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def roi_patch_pool_multi(stacked, specs, interpret=False):
    """Pool SEVERAL ROI sets from one storage plane, with a fused backward.

    ``specs``: tuple of ``(starts, wy, wx)`` triples (one per ROI set; the
    sets may differ in N and S). Returns one pooled array per set.

    The forward is identical to independent :func:`roi_patch_interpolate`
    calls. The point is the BACKWARD: differentiating k independent pools
    of the same plane yields k full f32 gradient pyramids that XLA
    zero-initializes and then adds — at the Mask R-CNN train shape
    (batch 16, plane [600, 336, 256]) the zeros + add of the box and mask
    poolers' planes measured 1.0 ms/img of pure HBM traffic, with the
    box/mask R-CNN heads' pools being the reference pattern
    (roi_heads.py:490,579). Here the k RMW backwards chain through ONE
    accumulator plane (``init=`` of :func:`roi_patch_backward`), so no
    extra plane, no add.
    """
    return tuple(
        roi_patch_interpolate(stacked, st, wy, wx, interpret=interpret)
        for (st, wy, wx) in specs
    )


def _multi_fwd(stacked, specs, interpret=False):
    template = jnp.zeros(stacked.shape[:-1] + (0,), stacked.dtype)
    return roi_patch_pool_multi(stacked, specs, interpret), (template, specs)


def _multi_bwd(interpret, res, gs):
    template, specs = res
    # All ROI sets pool the SAME storage plane, so every cotangent shares
    # the plane's channel count — the chained accumulator relies on it.
    assert all(g.shape[-1] == gs[0].shape[-1] for g in gs), (
        "pool_multi cotangents must share the storage plane's channel count"
    )
    shape = template.shape[:-1] + (gs[0].shape[-1],)
    acc = None
    for g, (starts, wy, wx) in zip(gs, specs):
        acc = roi_patch_backward(
            g, starts, wy, wx, out_shape=shape, interpret=interpret, init=acc
        )
    return acc.astype(template.dtype), tuple((None, None, None) for _ in specs)


roi_patch_pool_multi.defvjp(_multi_fwd, _multi_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def roi_patch_interpolate(
    stacked: jnp.ndarray,  # [B, Htot, Wm, C] row-concatenated pyramids
    starts: jnp.ndarray,  # [B, N, 3] int32 (row, tx, window-tier); tx mult of 8
    wy: jnp.ndarray,  # [B, N, S, P] f32 bin-averaged hat weights
    wx: jnp.ndarray,  # [B, N, S, P]
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns [B, N, S, S, C] pooled features in stacked's dtype.

    Unbatched 3-/2-d inputs are promoted to a batch of one.
    """
    squeeze = stacked.ndim == 3
    if squeeze:
        stacked, starts, wy, wx = (x[None] for x in (stacked, starts, wy, wx))
    bsz, n, s, p = wy.shape
    c = stacked.shape[-1]
    group = _vmem_group(FWD_GROUP, p, c, stacked.dtype.itemsize, buffers=2)
    m = -(-n // group) * group
    if m != n:
        # Pad with sentinel-classed dummies (no DMA issued, zero output);
        # their output blocks are sliced off below.
        pad = m - n
        starts = jnp.concatenate(
            [
                starts,
                jnp.tile(
                    jnp.array(
                        [[[stacked.shape[1] - p, 0, skip_tier_class(p)]]],
                        jnp.int32,
                    ),
                    (bsz, pad, 1),
                ),
            ],
            axis=1,
        )
        wy = jnp.concatenate([wy, jnp.zeros((bsz, pad, s, p), wy.dtype)], 1)
        wx = jnp.concatenate([wx, jnp.zeros((bsz, pad, s, p), wx.dtype)], 1)
    # SMEM layout: per-ROI axis last (see roi_patch_backward).
    starts_t = jnp.moveaxis(starts, 2, 0)  # [3, B, M]
    # HIGHEST (six-pass) inside Mosaic hangs compilation at these shapes;
    # float32 callers route to the XLA path instead (models/poolers.py), so
    # this kernel always runs native MXU precision.
    precision = jax.lax.Precision.DEFAULT
    q = m // group

    def run(starts_t, stacked, wy, wx):
        # Shapes read from the arguments: under shard_map (multi-device
        # mesh) this body sees the LOCAL batch shard.
        bsz = stacked.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, q),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # stacked stays in HBM
                pl.BlockSpec((1, group, s, p), lambda b, j, *_: (b, j, 0, 0)),
                pl.BlockSpec((1, group, s, p), lambda b, j, *_: (b, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, group, s, s, c), lambda b, j, *_: (b, j, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, group, p, p, c), stacked.dtype),
                pltpu.VMEM((group * s, group * p), stacked.dtype),  # bd wy
                pltpu.SemaphoreType.DMA((2, group)),
            ],
        )
        return pl.pallas_call(
            _make_kernel(group, precision),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, m, s, s, c), stacked.dtype),
            compiler_params=pltpu.CompilerParams(
                # Mosaic's scoped-stack accounting carries a large group-
                # independent term beyond the declared scratch (measured at
                # the C4 shape, C=1024: actual 14.9M at group 2 / 18.1M at
                # group 3 vs ~9M/13M of declared buffers) — budget a fixed
                # 10MB of headroom on top of the padded buffer estimate.
                vmem_limit_bytes=int(
                    1.35 * (2 * group * p * p * c + 2 * group * s * p
                            + group * s * s * c)
                    * stacked.dtype.itemsize
                    + 10 * 1024 * 1024
                ),
            ),
            interpret=interpret,
        )(starts_t, stacked, wy, wx)

    out = _maybe_shard_map(
        run, in_batch_dims=(1, 0, 0, 0), out_batch_dim=0
    )(starts_t, stacked, wy, wx)
    out = out[:, :n]
    return out[0] if squeeze else out
