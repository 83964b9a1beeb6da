"""Fixed-shape non-maximum suppression for TPU.

The reference delegates to ``tf.image.non_max_suppression`` inside per-image
``tf.map_fn`` (/root/reference/lib/layers/nms.py:6-26); upstream Detectron2
uses a CUDA kernel. Neither shape-generalizes to XLA. This module implements
**exact greedy NMS** as a blocked fixed-point iteration:

  * boxes are score-sorted once (``lax.top_k``);
  * blocks of ``BLOCK`` boxes are processed in score order with ``lax.scan`` —
    suppression *from previous blocks* is one [BLOCK, N] masked any-reduce
    (VPU-friendly), suppression *within a block* is a small fixed-point loop
    on the strict lower triangle that converges to the greedy solution;
  * everything is static-shape: outputs are a keep-mask over the sorted
    order plus gather indices, never a dynamic-length tensor.

The result is bit-identical to sequential greedy NMS (same tie-breaking:
score order, stable over the input order for equal scores).

Class-aware NMS uses the coordinate-offset trick (boxes shifted per class so
cross-class pairs never overlap), as the reference does at
fast_rcnn.py:138-146.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops

BLOCK = 128

NEG_INF = -1e10


def _pallas_enabled() -> bool:
    """Route the keep-mask sweep to the Pallas kernel on TPU.

    The XLA sweep's while loops become batched-while under vmap, whose
    lowering pays a per-iteration full-state select per lane; the Pallas
    kernel (ops/pallas/nms_keep.py) keeps the batch as a native grid
    dimension. D2TPU_NMS_PALLAS=0/1 forces the path (tests, triage).
    """
    env = os.environ.get("D2TPU_NMS_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        # Multi-device: GSPMD cannot auto-partition Mosaic custom calls,
        # and this kernel sits under per-image vmap (no clean shard_map
        # seam like the ROI kernels have) — the XLA sweep shards fine and
        # its gap vs the kernel at FPN budgets is small.
        return jax.default_backend() == "tpu" and jax.device_count() == 1
    except RuntimeError:  # backend not initialized yet
        return False


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    max_keep: int | None = None,
    presorted: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS over ``[N, 4]`` boxes.

    Returns ``(order, keep, kept_scores)``:
      * ``order``  [N] — indices into the input, sorted by descending score;
      * ``keep``   [N] bool — whether the box at ``order[i]`` survives;
      * ``kept_scores`` [N] — scores in sorted order, NEG_INF where dropped.

    Callers take the top-k of ``kept_scores`` to get a fixed-size result.

    ``max_keep``: only the top ``max_keep`` survivors are needed. EXACT for
    any consumer of at most that many survivors (greedy NMS's keep
    decisions depend only on earlier, higher-scoring boxes, and blocks run
    in score order — the same early-exit
    ``tf.image.non_max_suppression(max_output_size=k)`` performs).
    Implementation: the sweep is split into STAGES of ``2 * max_keep``
    candidates. Every stage is a plain ``lax.scan`` over its blocks with
    the IoU columns NARROWED to the stage's end (suppressors always precede
    the suppressed, so later columns are dead weight); each stage after the
    first is gated by a run-once while_loop that skips it entirely when
    ``max_keep`` survivors already exist. Two properties matter on TPU:

      * the while granularity is a STAGE, not a block — a vmapped
        while_loop pays full-state select/copy overhead per iteration
        (~100us at the RPN train shape; a per-block early-exit tail
        measured 37 -> 27 img/s end-to-end), so at most
        ``num_stages - 1`` such copies ever happen;
      * even when every stage runs, the bucketed column windows do ~1.5x
        less IoU work than the flat sweep.

    RPN at train (N=12000, keep 2000) typically stops after 1-2 stages of
    32 blocks x 4096/8192 columns instead of 94 blocks x 12032.

    ``presorted``: the caller guarantees ``scores`` are already descending
    over the VALID entries (the universal case in this framework — every
    call site feeds the output of a prior ``top_k``). Skips the internal
    O(N log N) sort; invalid entries may interleave freely (they neither
    keep nor suppress, and greedy decisions depend only on the relative
    order of valid candidates). With equal scores the stable sort would
    preserve input order, so results are bit-identical to presorted=False.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)

    if presorted:
        order = jnp.arange(n)
        sorted_scores = masked_scores
        sorted_boxes = boxes
    else:
        # Stable sort by descending score (top_k is stable in XLA).
        sorted_scores, order = jax.lax.top_k(masked_scores, n)
        sorted_boxes = jnp.take(boxes, order, axis=0)
    sorted_valid = sorted_scores > NEG_INF / 2

    if _pallas_enabled():
        from .pallas.nms_keep import greedy_keep

        keep = greedy_keep(
            sorted_boxes, sorted_valid, iou_threshold, max_keep=max_keep
        )
        return order, keep, jnp.where(keep, sorted_scores, NEG_INF)

    # Pad to a BLOCK multiple with far-away boxes so padded rows never
    # interact with real ones.
    n_pad = n + ((-n) % BLOCK)
    sorted_boxes_p = _pad_to_multiple(sorted_boxes, BLOCK, 0, -1e8)
    sorted_valid_p = _pad_to_multiple(sorted_valid, BLOCK, 0, False)
    num_blocks = n_pad // BLOCK

    row_ids = jnp.arange(BLOCK)
    tril_strict = row_ids[:, None] > row_ids[None, :]  # j < i within block

    def make_process_block(cols):
        # ``cols``: static IoU column window. Correct whenever every block
        # the function processes satisfies start + BLOCK <= cols (a box is
        # only ever suppressed by an EARLIER box in score order).
        cols_boxes = sorted_boxes_p[:cols]

        def process_block(keep_so_far, block_idx):
            start = block_idx * BLOCK  # traced when called from a while loop
            rows = jax.lax.dynamic_slice_in_dim(sorted_boxes_p, start, BLOCK, 0)
            rows_valid = jax.lax.dynamic_slice_in_dim(
                sorted_valid_p, start, BLOCK, 0
            )
            # IoU of this block against every candidate column (once per
            # row-block).
            iou = box_ops.pairwise_iou(rows, cols_boxes)  # [BLOCK, cols]
            over = iou > iou_threshold

            # Suppression by already-kept boxes from earlier blocks.
            # keep_so_far is zero at and after this block, so no extra
            # position masking needed.
            sup_prev = jnp.any(over & keep_so_far[None, :cols], axis=1)
            alive0 = rows_valid & ~sup_prev

            # Within-block greedy via fixed-point on the strict lower
            # triangle: alive[i] = alive0[i] and no alive[j] (j<i) overlaps
            # i. Converges to the greedy solution; each iteration at least
            # finalizes the earliest undecided row, so BLOCK iterations
            # always suffice — the while_loop exits as soon as nothing
            # changes (typically <8 iterations).
            w = jax.lax.dynamic_slice(over, (0, start), (BLOCK, BLOCK))
            w = w & tril_strict

            # Pin alive0/w as materialized values so XLA cannot
            # rematerialize their producer chain — the full [BLOCK, cols]
            # IoU + any-reduce above — inside the fixed-point loop body.
            alive0, w = jax.lax.optimization_barrier((alive0, w))

            def cond(state):
                alive, changed = state
                return changed

            def body(state):
                alive, _ = state
                new_alive = alive0 & ~jnp.any(w & alive[None, :], axis=1)
                return new_alive, jnp.any(new_alive != alive)

            alive, _ = jax.lax.while_loop(cond, body, (alive0, jnp.array(True)))

            keep_so_far = jax.lax.dynamic_update_slice_in_dim(
                keep_so_far, alive, start, 0
            )
            return keep_so_far, None

        return process_block

    keep_init = jnp.zeros((n_pad,), bool)
    stage_blocks = num_blocks
    if max_keep is not None and max_keep < n:
        # 2x margin: a stage adds at least max_keep survivors unless more
        # than half of it gets suppressed; later stages cover that case.
        stage_blocks = min(num_blocks, -(-2 * max_keep // BLOCK))

    # Stage 0 always runs.
    keep_final, _ = jax.lax.scan(
        make_process_block(stage_blocks * BLOCK),
        keep_init,
        jnp.arange(stage_blocks),
    )

    start = stage_blocks
    while start < num_blocks:
        nb = min(stage_blocks, num_blocks - start)
        pb = make_process_block((start + nb) * BLOCK)

        def stage_body(state, start=start, nb=nb, pb=pb):
            keep_so_far, _, _ = state
            keep_so_far, _ = jax.lax.scan(
                pb, keep_so_far, jnp.arange(start, start + nb)
            )
            return (
                keep_so_far,
                jnp.sum(keep_so_far.astype(jnp.int32)),
                jnp.array(True),
            )

        def stage_cond(state):
            _, kept, ran = state
            return (kept < max_keep) & ~ran

        keep_final, _, _ = jax.lax.while_loop(
            stage_cond,
            stage_body,
            (
                keep_final,
                jnp.sum(keep_final.astype(jnp.int32)),
                jnp.array(False),
            ),
        )
        start += nb
    keep = keep_final[:n]
    kept_scores = jnp.where(keep, sorted_scores, NEG_INF)
    return order, keep, kept_scores


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid: jnp.ndarray | None = None,
    presorted: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS with a fixed-size result: top ``max_outputs`` surviving boxes.

    Returns ``(boxes, scores, indices, valid)`` with leading dim
    ``max_outputs``; ``indices`` point into the input array; invalid slots
    have score NEG_INF and valid False.
    """
    # max_keep=max_outputs is exact here by construction: this function
    # returns at most the top max_outputs survivors (greedy prefix
    # property; see nms()). The prefix-scan formulation keeps the
    # early-exit benefit without running the whole sweep as a vmapped
    # while_loop (which lowered pathologically: train 37 -> 22 img/s).
    order, keep, kept_scores = nms(
        boxes, scores, iou_threshold, valid, max_keep=max_outputs,
        presorted=presorted,
    )
    k = min(max_outputs, boxes.shape[0])
    top_scores, top_pos = jax.lax.top_k(kept_scores, k)
    out_indices = jnp.take(order, top_pos)
    out_valid = top_scores > NEG_INF / 2
    out_boxes = jnp.take(boxes, out_indices, axis=0)
    if k < max_outputs:
        pad = max_outputs - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad), constant_values=NEG_INF)
        out_indices = jnp.pad(out_indices, (0, pad))
        out_valid = jnp.pad(out_valid, (0, pad))
    return out_boxes, top_scores, out_indices, out_valid


def class_aware_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    valid: jnp.ndarray | None = None,
    class_agnostic: bool = False,
    presorted: bool = False,
):
    """Per-class NMS via the coordinate-offset trick.

    Boxes of different classes are translated to disjoint regions so one
    global NMS equals independent per-class NMS (reference
    fast_rcnn.py:138-146). Returns the same tuple as :func:`nms_fixed`.
    """
    if class_agnostic:
        return nms_fixed(
            boxes, scores, iou_threshold, max_outputs, valid,
            presorted=presorted,
        )
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    _, out_scores, out_indices, out_valid = nms_fixed(
        shifted, scores, iou_threshold, max_outputs, valid,
        presorted=presorted,
    )
    out_boxes = jnp.take(boxes, out_indices, axis=0)
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    return out_boxes, out_scores, out_indices, out_valid


@functools.partial(jax.jit, static_argnames=("kernel",))
def matrix_nms(
    seg_masks: jnp.ndarray,
    labels: jnp.ndarray,
    scores: jnp.ndarray,
    sigma: float = 2.0,
    kernel: str = "gaussian",
    mask_areas: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SOLOv2 Matrix NMS: soft score decay from the full mask-IoU matrix.

    ``seg_masks``: [N, H, W] binary masks (float or bool), score-sorted
    descending. Returns decayed scores [N]. All-matmul (one [N,HW]x[HW,N]
    product) — exactly the op the MXU is built for; the reference builds the
    same math from TF ops at lib/layers/nms.py:29-83, mmdetection uses CUDA.
    """
    n = seg_masks.shape[0]
    flat = seg_masks.reshape(n, -1).astype(jnp.float32)
    if mask_areas is None:
        mask_areas = flat.sum(axis=1)
    inter = flat @ flat.T  # [N, N] on the MXU
    union = mask_areas[:, None] + mask_areas[None, :] - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-6), 0.0)
    # Layout: entry [i, j] means "mask i (higher-scoring, i < j) suppresses
    # mask j". Only same-class, strictly-earlier masks suppress.
    upper = jnp.triu(jnp.ones((n, n), bool), k=1)
    same_class = labels[:, None] == labels[None, :]
    decay_iou = jnp.where(upper & same_class, iou, 0.0)  # [i, j]
    # Compensation per suppressor i: how much i itself was overlapped by even
    # higher-scoring masks (column-max of i as a suppressed mask).
    compensate_iou = jnp.max(decay_iou, axis=0)  # [N], indexed by i
    if kernel == "gaussian":
        decay = jnp.exp(-(decay_iou**2 - compensate_iou[:, None] ** 2) * sigma)
    elif kernel == "linear":
        decay = (1.0 - decay_iou) / jnp.maximum(
            1.0 - compensate_iou[:, None], 1e-6
        )
    else:
        raise ValueError(f"unknown matrix_nms kernel: {kernel}")
    decay_coef = jnp.min(decay, axis=0)  # per suppressed mask j
    return scores * jnp.minimum(decay_coef, 1.0)
