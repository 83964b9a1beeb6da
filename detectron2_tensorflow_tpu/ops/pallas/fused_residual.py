"""Fused 1x1-conv + FrozenBN + residual-add + ReLU (bottleneck epilogue).

STATUS: OPT-IN ONLY (D2TPU_ENABLE_FUSED_EPILOGUE=1) — measured a NET
REGRESSION at the flagship serving shape; see fused_epilogue_supported for
the numbers. Kept as a documented dead end: the per-kernel win is real but
the Mosaic custom call pins operands to the default layout, and the layout
copies XLA must then insert around every bottleneck tail cost more than the
fused epilogue saves.

The tail of every ResNet bottleneck block is
``relu(frozen_bn(conv1x1(x)) + shortcut)``.  XLA on TPU emits the conv and
the add+relu as SEPARATE kernels (the residual add has a second
feature-map-sized operand, which blocks output fusion into the convolution),
so the conv result makes a full HBM round trip: at batch 16 / 800x1344 the
``add_maximum`` fusions alone measure ~0.7 ms/img of Mask R-CNN inference
(~11% of the step).  A 1x1 conv is a plain matmul, so the whole epilogue is
one Pallas kernel: x-tile @ W on the MXU, scale/shift + shortcut-add + relu
on the VPU, one HBM write.

Reference semantics: bottleneck tail of
/root/reference/lib/modeling/backbone/blocks.py:144-188 (conv3 + shortcut
add + relu with frozen BN).  Numerics note: the epilogue accumulates in
f32 and rounds ONCE at the output, where the unfused path rounds to bf16
after the conv, after the BN affine, and after the add — the fused result
is slightly more accurate, not bit-identical (tested to bf16 tolerance).

The backward (training) is plain XLA: two matmuls (dx, dW) plus elementwise
masking — identical in structure to what autodiff produces for the unfused
graph, so training speed/numerics are unchanged except the faster forward.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BM = 1024  # row tile (B*H*W axis)
_BN = 512  # output-channel tile


def _epilogue_kernel(x_ref, w_ref, ss_ref, sc_ref, o_ref):
    """One (bm, bn) output tile: relu((x @ w) * scale + shift + shortcut)."""
    acc = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    )
    scale = ss_ref[0, :][None, :]
    shift = ss_ref[1, :][None, :]
    y = acc * scale + shift + sc_ref[...].astype(jnp.float32)
    o_ref[...] = jnp.maximum(y, 0.0).astype(o_ref.dtype)


def _reference(x, kernel, scale, shift, shortcut):
    """Unfused XLA path (CPU fallback + golden for tests).

    Mirrors Conv2D(norm="FrozenBN") + add + relu step-for-step, including
    the per-step dtype rounding of the unfused graph.
    """
    w = kernel.reshape(kernel.shape[-2], kernel.shape[-1]).astype(x.dtype)
    y = jnp.dot(x.reshape(-1, x.shape[-1]), w).reshape(
        x.shape[:-1] + (kernel.shape[-1],)
    )
    y = y * scale.astype(y.dtype) + shift.astype(y.dtype)
    return jax.nn.relu(y + shortcut)


def _launch(x, w2d, ss, shortcut, *, interpret=False):
    """Pallas launch on the LOCAL (per-device) batch."""
    b, h, wd, k = x.shape
    n = w2d.shape[-1]
    m = b * h * wd
    xm = x.reshape(m, k)
    scm = shortcut.reshape(m, n)
    bm = min(_BM, m)
    bn = min(_BN, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn))
    out = pl.pallas_call(
        _epilogue_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((2, bn), lambda i, j: (0, j)),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        interpret=interpret,
    )(xm, w2d, ss, scm)
    return out.reshape(b, h, wd, n)


def _maybe_shard_map(run):
    """shard_map over the active mesh's 'data' axis (GSPMD cannot partition
    Mosaic custom calls — same constraint as ops/pallas/roi_patch.py)."""
    from ...parallel import active_multidevice_mesh

    mesh = active_multidevice_mesh()
    if mesh is None:
        return run
    from jax.sharding import PartitionSpec as P

    batched = P("data")
    repl = P()
    return jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(batched, repl, repl, batched),
        out_specs=batched,
        check_vma=False,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_conv1x1_bn_add_relu(x, kernel, scale, shift, shortcut):
    """relu((x conv1x1 kernel) * scale + shift + shortcut).

    x: [B, H, W, K]; kernel: [1, 1, K, N] (HWIO); scale/shift: [N] (the
    folded FrozenBN affine); shortcut: [B, H, W, N].  Returns [B, H, W, N]
    in x.dtype.  On TPU the forward is one Pallas kernel; elsewhere the
    unfused XLA reference runs (so CPU tests / the virtual-device multichip
    dryrun need no special casing).

    Gradient caveat: dx/dw/dshift/dshortcut are exact, but ``dscale`` is
    APPROXIMATE — the backward reconstructs the raw conv output from the
    rounded saved activation as (out - shift - shortcut) / scale, which in
    bf16 with small |scale| amplifies rounding error. Harmless in this
    framework because the folded affine lives in the never-optimized
    ``frozen`` collection; recompute the conv in _bwd (one extra matmul)
    if frozen-param gradients ever become load-bearing.
    """
    out, _ = _fwd(x, kernel, scale, shift, shortcut)
    return out


def _fwd(x, kernel, scale, shift, shortcut):
    if jax.default_backend() == "tpu":
        k, n = kernel.shape[-2], kernel.shape[-1]
        w2d = kernel.reshape(k, n).astype(x.dtype)
        ss = jnp.stack([scale, shift]).astype(jnp.float32)
        run = _maybe_shard_map(_launch)
        out = run(x, w2d, ss, shortcut)
    else:
        out = _reference(x, kernel, scale, shift, shortcut)
    return out, (x, kernel, scale, shift, shortcut, out)


def _bwd(res, dy):
    x, kernel, scale, shift, shortcut, out = res
    k, n = kernel.shape[-2], kernel.shape[-1]
    w2d = kernel.reshape(k, n).astype(x.dtype)
    mask = (out > 0).astype(dy.dtype)
    g = dy * mask  # d(pre-relu)
    gs = g * scale.astype(g.dtype)  # through the BN scale
    # dx / dW: the two matmuls autodiff would emit for the conv.
    m = x.shape[0] * x.shape[1] * x.shape[2]
    gs2 = gs.reshape(m, n)
    x2 = x.reshape(m, k)
    dx = jnp.dot(gs2, w2d.T).reshape(x.shape).astype(x.dtype)
    dw = jnp.dot(
        x2.T.astype(jnp.float32), gs2.astype(jnp.float32)
    ).reshape(kernel.shape).astype(kernel.dtype)
    # Frozen affine grads (exact, though the frozen collection is never
    # optimized): d(pre)/d(scale) = raw conv output, recovered from the
    # saved activation as (out - shift - shortcut) / scale wherever the
    # relu gate is open (g is zero where it is closed, so the garbage
    # recovery there never contributes).
    g32 = g.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    inv = jnp.where(s32 == 0.0, 0.0, 1.0 / jnp.where(s32 == 0.0, 1.0, s32))
    raw = (
        out.astype(jnp.float32)
        - shift.astype(jnp.float32)
        - shortcut.astype(jnp.float32)
    ) * inv
    dscale = jnp.sum(g32 * raw, axis=(0, 1, 2)).astype(scale.dtype)
    dshift = jnp.sum(g32, axis=(0, 1, 2)).astype(shift.dtype)
    dsc = g.astype(shortcut.dtype)
    return dx, dw, dscale, dshift, dsc


fused_conv1x1_bn_add_relu.defvjp(_fwd, _bwd)


def fused_epilogue_supported(
    kernel_size: int,
    strides: int,
    groups: int,
    dilation: int,
    norm: str,
    use_bias: bool,
    padding="SAME",
) -> bool:
    """Static predicate: can this Conv2D+residual ride the fused kernel?

    Padding must be a no-op for a 1x1/stride-1 conv: only "SAME"/"VALID"
    qualify. Explicit numeric padding (e.g. [(1, 1), (1, 1)]) grows the
    output, which the fused matmul formulation cannot express — such a
    conv takes the unfused path (where the residual add then fails loudly
    on the shape mismatch instead of silently computing the unpadded
    result)."""
    import os

    # MEASURED NET REGRESSION — opt-in only. The kernel does win the
    # conv->add+relu HBM round trip in isolation, but as a Mosaic custom
    # call it pins its operands to the DEFAULT layout, while XLA gives the
    # producing convs batch-minormost {3,0,2,1} layouts: every bottleneck
    # tail then pays full-feature-map layout copies (copy.885/.888/... in
    # the serving profile, ~0.3 ms/img at batch 32). Mask R-CNN R50-FPN
    # 800x1344 bf16 serving on v5e: 166.3 img/s with the kernel OFF vs
    # 138.5 with it ON (driver bench, best-of-3). Revisit if Mosaic ever
    # honors custom layouts on pallas_call operands.
    if not os.environ.get("D2TPU_ENABLE_FUSED_EPILOGUE"):
        return False
    return epilogue_shape_supported(
        kernel_size, strides, groups, dilation, norm, use_bias, padding
    )


def epilogue_shape_supported(
    kernel_size: int,
    strides: int,
    groups: int,
    dilation: int,
    norm: str,
    use_bias: bool,
    padding="SAME",
) -> bool:
    """The shape-only predicate behind ``fused_epilogue_supported`` (no env
    gate) — shared with Conv2D's opt-in dot-tail formulation so the two
    paths can never drift on which convs qualify."""
    return (
        kernel_size == 1
        and strides == 1
        and groups == 1
        and dilation == 1
        and norm == "FrozenBN"
        and not use_bias
        and padding in ("SAME", "VALID")
    )
