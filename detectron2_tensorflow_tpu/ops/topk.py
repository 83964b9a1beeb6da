"""Exact hierarchical top-k for dense score maps.

``lax.top_k`` over a full RPN objectness level (e.g. 200x336x3 = 201k scores
at P2) is the single most expensive piece of proposal selection on TPU (the
sort network scans every element). This module preselects 2x2-window maxima
first, which is EXACT, not approximate:

    if a score s ranks in the global top-k, its window's max is >= s; if
    that window did NOT rank in the top-k windows by max, then k windows
    each contain a score > s — i.e. at least k scores exceed s, so s could
    not be in the top-k. Contradiction.

(The same argument powers the class-axis preselect in
models/single_stage/retinanet.py. Ties are broken differently from a flat
``lax.top_k``, matching the latitude the reference's tf.nn.top_k has.)

The window restructuring uses four strided slices concatenated to
[n_windows, 4A] — measured ~1.4x faster than a reshape+transpose and 2.5x
faster than the flat scan at P2 scale (the candidate fetch becomes a
contiguous ROW gather instead of an element gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flat_top_k(scores: jnp.ndarray, k: int, window: int = 8):
    """Exact top-k over a flat [N] vector via windowed preselect.

    Same exactness argument as the 2x2 spatial preselect above, with 1-D
    windows of ``window`` elements: if s ranks in the global top-k, its
    window's max is >= s; if that window is not among the top-k windows by
    max, then k other windows each contain an element > s — contradiction.

    Replaces one O(N) sort with a cheap windowed max-reduce plus two sorts
    over N/window and k*window elements. At the Fast R-CNN serving shape
    (N = 80000 proposal x class scores, k = 2000) the XLA full sort costs
    0.086 ms/img (sort.14 in the round-4 roofline audit); the windowed form
    sorts 10000 + 16000 instead. Falls back to ``lax.top_k`` when the
    preselect cannot hold k windows. Tie order may differ from a flat
    ``lax.top_k`` (same latitude as tf.nn.top_k).
    """
    n = scores.shape[0]
    k = min(k, n)
    if (n + window - 1) // window < k:
        return jax.lax.top_k(scores, k)
    if n % window:
        pad = window - n % window
        scores = jnp.pad(scores, (0, pad), constant_values=-jnp.inf)
    nw = scores.shape[0] // window
    mat = scores.reshape(nw, window)
    wmax = jnp.max(mat, axis=1)
    _, widx = jax.lax.top_k(wmax, k)
    cand = jnp.take(mat, widx, axis=0)  # [k, window] contiguous row gather
    vals, ci = jax.lax.top_k(cand.reshape(-1), k)
    idx = jnp.take(widx, ci // window) * window + ci % window
    # -inf tail pads can only be selected when the k-th value is itself
    # -inf; clamp so returned indices are always in range (callers treat
    # -inf slots as invalid).
    return vals, jnp.minimum(idx, n - 1)


def spatial_top_k(scores: jnp.ndarray, k: int):
    """Exact top-k over a [H, W, A] score map (row-major (y, x, a) layout).

    Returns (values [k], flat_idx [k]) identical in content to
    ``lax.top_k(scores.reshape(-1), k)`` up to tie order. Falls back to the
    flat scan when the map is small (the preselect needs >= k windows so the
    candidate pool is guaranteed to hold k real scores).
    """
    h, w, a = scores.shape
    n = h * w * a
    k = min(k, n)
    gh, gw = -(-h // 2), -(-w // 2)
    if gh * gw < k or n < 4 * k:
        return jax.lax.top_k(scores.reshape(-1), k)

    if (h % 2) or (w % 2):
        scores_p = jnp.pad(
            scores, ((0, gh * 2 - h), (0, gw * 2 - w), (0, 0)),
            constant_values=-jnp.inf,
        )
    else:
        scores_p = scores

    views = [
        scores_p[dy::2, dx::2].reshape(gh * gw, a)
        for dy in (0, 1)
        for dx in (0, 1)
    ]
    stackv = jnp.concatenate(views, axis=1)  # [gh*gw, 4A], slot = (q, a)
    wmax = jnp.max(stackv, axis=1)
    _, gidx = jax.lax.top_k(wmax, k)
    cand = jnp.take(stackv, gidx, axis=0)  # [k, 4A] contiguous row gather
    vals, ci = jax.lax.top_k(cand.reshape(-1), k)

    wi = jnp.take(gidx, ci // (4 * a))
    si = ci % (4 * a)
    q = si // a  # which of the 4 strided views
    dy, dx = q // 2, q % 2
    y = (wi // gw) * 2 + dy
    x = (wi % gw) * 2 + dx
    # -inf pad cells can never outrank the >= k real scores in the pool, so
    # (y, x) is always in range.
    return vals, (y * w + x) * a + (si % a)
