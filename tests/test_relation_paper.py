"""Pin the Relation Networks embedding math against the paper.

Hu et al., "Relation Networks for Object Detection" (CVPR 2018), §3 and
Appendix; the reference repo ports the same math at
lib/modeling/roi_heads/relation_module.py:13-193 (with an undefined-variable
bug and a missing |.| the implementation under test fixes — see
models/roi_heads/relation.py module docstring).

Each test re-derives the published algorithm in independent, sequential
numpy (scalar loops, no shared helpers) and asserts the vectorized JAX
implementation reproduces it:

- Eq. 5 geometry feature: (log(|xm-xn|/wm), log(|ym-yn|/hm), log(wn/wm),
  log(hn/hm)), |.|-clamped at 1e-3, embedded by the sin/cos scheme of the
  official implementation (x100 scaling, wavelength 1000^(i/(d/8))).
- The rank embedding of the duplicate-removal stage: the same sinusoid on
  the raw rank index (no x100), per the official extract_rank_embedding.
- Eq. 3's geometric bias: softmax(logits + log(wg)) must equal the paper's
  wg * exp(wa) / sum_k wg_k * exp(wa_k) renormalization.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def paper_position_embedding(feats: np.ndarray, dim_per_feat: int,
                             wave_length: float = 1000.0) -> np.ndarray:
    """Scalar-loop transcription of extract_position_embedding: for each
    scalar feature f, emit [sin(f/L^(k/H)) for k<H] ++ [cos(...)], H = dim/2."""
    *lead, nfeat = feats.shape
    half = dim_per_feat // 2
    out = np.zeros(tuple(lead) + (nfeat * dim_per_feat,), np.float64)
    flat = feats.reshape(-1, nfeat)
    oflat = out.reshape(-1, nfeat * dim_per_feat)
    for row in range(flat.shape[0]):
        for f in range(nfeat):
            base = f * dim_per_feat
            for k in range(half):
                arg = flat[row, f] / (wave_length ** (k / half))
                oflat[row, base + k] = math.sin(arg)
                oflat[row, base + half + k] = math.cos(arg)
    return out


def test_geometry_embedding_matches_paper_eq5():
    from detectron2_tensorflow_tpu.models.roi_heads.relation import (
        geometry_embeddings,
    )

    rng = np.random.default_rng(7)
    n = 5
    lo = rng.uniform(0, 200, (n, 2))
    wh = rng.uniform(2, 120, (n, 2))
    boxes = np.concatenate([lo, lo + wh], -1).astype(np.float32)

    got = np.asarray(geometry_embeddings(jnp.asarray(boxes)[None], 64))[0]

    # Independent scalar derivation of Eq. 5 for every (m, n) pair.
    feats = np.zeros((n, n, 4), np.float64)
    for m in range(n):
        for nn_ in range(n):
            xm = (boxes[m, 0] + boxes[m, 2]) / 2
            ym = (boxes[m, 1] + boxes[m, 3]) / 2
            xn = (boxes[nn_, 0] + boxes[nn_, 2]) / 2
            yn = (boxes[nn_, 1] + boxes[nn_, 3]) / 2
            wm = max(boxes[m, 2] - boxes[m, 0], 1.0)
            hm = max(boxes[m, 3] - boxes[m, 1], 1.0)
            wn = max(boxes[nn_, 2] - boxes[nn_, 0], 1.0)
            hn = max(boxes[nn_, 3] - boxes[nn_, 1], 1.0)
            feats[m, nn_, 0] = math.log(max(abs(xm - xn) / wm, 1e-3))
            feats[m, nn_, 1] = math.log(max(abs(ym - yn) / hm, 1e-3))
            feats[m, nn_, 2] = math.log(wn / wm)
            feats[m, nn_, 3] = math.log(hn / hm)
    want = paper_position_embedding(100.0 * feats, 64 // 4)

    np.testing.assert_allclose(got, want, atol=2e-4)


def test_rank_embedding_matches_official_recipe():
    """extract_rank_embedding: raw rank index (no x100), wavelength 1000."""
    from detectron2_tensorflow_tpu.models.roi_heads.relation import (
        sinusoid_embedding,
    )

    ranks = np.arange(12, dtype=np.float64)[:, None]
    got = np.asarray(sinusoid_embedding(jnp.asarray(ranks, jnp.float32), 128))
    want = paper_position_embedding(ranks, 128)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_geometric_bias_is_paper_eq3_renormalization():
    """softmax(qk + log(wg)) == wg*exp(qk) / sum_j wg_j*exp(qk_j) (Eq. 3)."""
    rng = np.random.default_rng(3)
    qk = rng.standard_normal((4, 4)).astype(np.float64)
    wg = np.maximum(rng.standard_normal((4, 4)), 1e-6)

    ours = np.asarray(jax.nn.softmax(jnp.asarray(qk + np.log(wg)), axis=1))

    paper = np.zeros_like(qk)
    for m in range(4):
        denom = sum(wg[m, k] * math.exp(qk[m, k]) for k in range(4))
        for n_ in range(4):
            paper[m, n_] = wg[m, n_] * math.exp(qk[m, n_]) / denom
    np.testing.assert_allclose(ours, paper, atol=1e-6)


def test_relation_attention_reduces_to_geometry_prior_at_constant_qk():
    """With zero query/key kernels the attention must equal the normalized
    geometric prior — pins that log(wg) enters the logits (not a multiply
    after softmax) and that softmax runs over the key axis."""
    from detectron2_tensorflow_tpu.models.roi_heads.relation import (
        ObjectRelationModule,
        geometry_embeddings,
    )

    rng = np.random.default_rng(11)
    n, d = 6, 32
    x = jnp.asarray(rng.standard_normal((1, n, d)).astype(np.float32))
    lo = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(4, 60, (n, 2))
    boxes = jnp.asarray(
        np.concatenate([lo, lo + wh], -1).astype(np.float32)[None]
    )

    m = ObjectRelationModule(features=d, num_groups=4, key_dim=8)
    v = m.init(jax.random.PRNGKey(0), x, boxes)
    p = jax.tree_util.tree_map(lambda a: a, v["params"])  # mutable copy
    p["query"]["kernel"] = jnp.zeros_like(p["query"]["kernel"])
    p["query"]["bias"] = jnp.zeros_like(p["query"]["bias"])
    p["key"]["kernel"] = jnp.zeros_like(p["key"]["kernel"])
    p["key"]["bias"] = jnp.zeros_like(p["key"]["bias"])
    out = m.apply({"params": p}, x, boxes)

    # Expected: x + W_out @ concat_g(attn_g @ v_g), attn_g = wg_g / sum_j wg_g.
    geo = np.asarray(geometry_embeddings(boxes, 64))[0]  # [n, n, 64]
    wg = np.maximum(
        geo @ np.asarray(p["geometry_weight"]["kernel"])
        + np.asarray(p["geometry_weight"]["bias"]),
        1e-6,
    )  # [n, n, g]
    attn = wg / wg.sum(axis=1, keepdims=True)  # normalize over keys j
    vproj = (
        np.asarray(x[0]) @ np.asarray(p["value"]["kernel"])
        + np.asarray(p["value"]["bias"])
    ).reshape(n, 4, d // 4)
    gathered = np.einsum("ijg,jgc->igc", attn, vproj).reshape(n, d)
    want = (
        np.asarray(x[0])
        + gathered @ np.asarray(p["output"]["kernel"])
        + np.asarray(p["output"]["bias"])
    )
    np.testing.assert_allclose(np.asarray(out[0]), want, atol=1e-4)
