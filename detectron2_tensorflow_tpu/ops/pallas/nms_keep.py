"""Pallas TPU kernel: the greedy-NMS keep mask over score-sorted boxes.

The XLA formulation (ops/nms.py) runs the blocked fixed-point sweep under
``jax.vmap``: the within-block convergence ``while_loop`` and the stage
early-exit ``while_loop`` both become BATCHED while loops, whose XLA
lowering is pathological — every lane runs to the worst lane's trip count
and each iteration pays a full-state select per lane (measured ~100us/iter
at the RPN train shape; see ROUND3.md round-2 notes). This kernel runs the
identical math with the batch as a NATIVE grid dimension (vmap batches a
pallas_call by prepending a grid axis), so its control flow is plain
per-core scalar control:

  * the block sweep is a ``fori_loop`` over 128-row blocks; suppression
    from earlier blocks accumulates over CHUNK-column slices (bounds VMEM
    to [BLK, CHUNK] temps — the RPN-train shape is N=12032, whose full
    [128, N] f32 row-block temps alone would blow the 16MB VMEM budget);
  * the within-block greedy fixed point is a ``lax.while_loop`` with a
    ``[BLK, 1]`` carry — no vmap lane-select tax, exits on convergence
    (typically <8 iterations);
  * the ``max_keep`` early exit is PER BLOCK (``pl.when`` on an SMEM
    survivor counter) instead of the XLA path's per-stage granularity.

Bit-compatibility: the IoU formula mirrors structures/boxes.pairwise_iou
(same max/min/EPS ops in f32), the tie-breaking is the same score-sorted
greedy, and with ``max_keep=None`` the output equals the XLA sweep exactly
(tests/test_nms.py pins both claims). With ``max_keep`` both paths are
prefix-exact for any consumer of at most ``max_keep`` survivors (greedy
keep decisions depend only on earlier boxes).

Layout notes (TPU tiling): everything lives lane-major — boxes as ``[4, N]``
(coordinates on sublanes), validity and the keep mask as ``[1, N]`` — so no
input pays the (N, 1)->(N, 128)-lane padding tax. The only layout change is
``[1, BLK] -> [BLK, 1]`` (and back) for the alive vector, done as an
identity-mask reduction (``sum(eye * v, axis)``), pure VPU work Mosaic
accepts everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
CHUNK = 2048  # column-slice width for the prior-suppression accumulation
EPS = 1e-8  # structures/boxes.py EPS — keep in sync for bit-compatibility


@functools.lru_cache(maxsize=None)
def _make_kernel(n: int, iou_threshold: float, max_keep):
    nb = n // BLK
    chunk = min(CHUNK, n)

    def kernel(colsT_ref, valid_ref, keep_ref, kept_ref):
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
        eye = (row_ids == col_ids).astype(jnp.float32)
        tril = (row_ids > col_ids).astype(jnp.float32)

        keep_ref[...] = jnp.zeros((1, n), jnp.float32)
        kept_ref[0] = jnp.int32(0)

        def to_subs(v):  # [1, BLK] -> [BLK, 1]: v_out[i, 0] = v[0, i]
            return jnp.sum(eye * v, axis=1, keepdims=True)

        def to_lanes(v):  # [BLK, 1] -> [1, BLK]
            return jnp.sum(eye * v, axis=0, keepdims=True)

        def chunk_iou_over(rx0, ry0, rx1, ry1, rarea, x0, y0, x1, y1):
            """[BLK, c] overlap mask of the row block vs a column slice."""
            iw = jnp.maximum(jnp.minimum(rx1, x1) - jnp.maximum(rx0, x0), 0.0)
            ih = jnp.maximum(jnp.minimum(ry1, y1) - jnp.maximum(ry0, y0), 0.0)
            inter = iw * ih
            carea = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
            union = rarea + carea - inter
            iou = jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)
            return (iou > iou_threshold).astype(jnp.float32)

        def block_fn(carry):
            blk, kept = carry
            s = blk * BLK
            bx0 = colsT_ref[0:1, pl.ds(s, BLK)]  # [1, BLK] lane-major
            by0 = colsT_ref[1:2, pl.ds(s, BLK)]
            bx1 = colsT_ref[2:3, pl.ds(s, BLK)]
            by1 = colsT_ref[3:4, pl.ds(s, BLK)]
            bvalid = valid_ref[0:1, pl.ds(s, BLK)]

            rx0, ry0, rx1, ry1 = (
                to_subs(bx0), to_subs(by0), to_subs(bx1), to_subs(by1)
            )  # [BLK, 1] sublane-major row vectors
            rvalid = to_subs(bvalid)
            rarea = jnp.maximum(rx1 - rx0, 0.0) * jnp.maximum(ry1 - ry0, 0.0)

            # Suppression by kept boxes from earlier blocks, in CHUNK-column
            # slices. Slices may overshoot into [s, ...): those keep entries
            # are still zero (written strictly in block order), so they
            # contribute nothing.
            def chunk_fn(c, sp):
                cs = c * chunk
                over = chunk_iou_over(
                    rx0, ry0, rx1, ry1, rarea,
                    colsT_ref[0:1, pl.ds(cs, chunk)],
                    colsT_ref[1:2, pl.ds(cs, chunk)],
                    colsT_ref[2:3, pl.ds(cs, chunk)],
                    colsT_ref[3:4, pl.ds(cs, chunk)],
                )
                kept_cols = keep_ref[0:1, pl.ds(cs, chunk)]
                return jnp.maximum(
                    sp, jnp.max(over * kept_cols, axis=1, keepdims=True)
                )

            n_chunks = jax.lax.div(s + chunk - 1, chunk)
            sup_prev = jax.lax.fori_loop(
                0, n_chunks, chunk_fn, jnp.zeros((BLK, 1), jnp.float32)
            )
            alive0 = rvalid * (1.0 - sup_prev)  # [BLK, 1]

            # Within-block greedy fixed point on the strict lower triangle
            # of the block's own overlap matrix.
            w = chunk_iou_over(
                rx0, ry0, rx1, ry1, rarea, bx0, by0, bx1, by1
            ) * tril  # [BLK, BLK]

            def cond(c):
                return c[2]

            def body(c):
                alive_s, alive_l, _ = c
                sup = jnp.max(w * alive_l, axis=1, keepdims=True)
                new_s = alive0 * (1.0 - sup)
                changed = jnp.sum(jnp.abs(new_s - alive_s)) > 0
                return new_s, to_lanes(new_s), changed

            alive_s, alive_l, _ = jax.lax.while_loop(
                cond, body, (alive0, to_lanes(alive0), jnp.bool_(True))
            )
            keep_ref[0:1, pl.ds(s, BLK)] = alive_l
            return blk + 1, kept + jnp.sum(alive_s).astype(jnp.int32)

        if max_keep is None:
            def sweep_cond(carry):
                return carry[0] < nb
        else:
            # Stop the whole sweep once max_keep survivors exist — exact
            # for any consumer of at most max_keep survivors (greedy keep
            # decisions depend only on earlier, higher-scoring boxes).
            def sweep_cond(carry):
                return (carry[0] < nb) & (carry[1] < max_keep)

        _, kept = jax.lax.while_loop(
            sweep_cond, block_fn, (jnp.int32(0), jnp.int32(0))
        )
        kept_ref[0] = kept

    return kernel


def greedy_keep(
    sorted_boxes: jnp.ndarray,  # [N, 4] f32, score-sorted descending
    sorted_valid: jnp.ndarray,  # [N] bool
    iou_threshold: float,
    max_keep=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keep mask [N] bool of exact greedy NMS over pre-sorted boxes."""
    n = sorted_boxes.shape[0]
    # Pad so every CHUNK column slice any block can touch stays in bounds:
    # the last chunk of block nb-1 reads up to ceil((n_blk-128)/CHUNK)*CHUNK
    # + CHUNK, and the block loop itself needs a BLK multiple.
    n_blk = n + ((-n) % BLK)
    n_pad = n_blk if n_blk <= CHUNK else n_blk + ((-n_blk) % CHUNK)
    # Keep decisions are discrete — no tangents flow through them — and
    # pallas_call has no JVP rule, so cut the tape here (training traces
    # proposal NMS under grad before stop_gradient is applied downstream).
    boxes = jax.lax.stop_gradient(sorted_boxes).astype(jnp.float32)
    valid = jax.lax.stop_gradient(sorted_valid)
    if n_pad != n:
        # Far-away padding boxes never interact with real ones.
        boxes = jnp.pad(boxes, ((0, n_pad - n), (0, 0)), constant_values=-1e8)
        valid = jnp.pad(valid, (0, n_pad - n))
    colsT = boxes.T  # [4, n_pad] lane-major
    valid_l = valid[None, :].astype(jnp.float32)  # [1, n_pad]

    mk = None if max_keep is None or max_keep >= n else int(max_keep)
    kernel = _make_kernel(n_pad, float(iou_threshold), mk)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(colsT, valid_l)
    return keep[0, :n] > 0.5
