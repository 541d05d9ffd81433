"""Fixed-shape utility ops for dense-head post-processing and selection.

Static-shape replacements for the dynamic-indexing helpers at
/root/reference/mmdet/models/utils/misc.py (filter_scores_and_topk :308-353,
select_single_mlvl :277, unmap :222). Dynamic result counts become
(values, mask) pairs of static size.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def filter_scores_and_topk(scores, score_thr, topk):
    """Threshold (N, C) scores then take the global top-k (anchor, class) pairs.

    Returns:
        top_scores: (topk,) scores (0 where invalid).
        top_labels: (topk,) int32 class indices.
        top_anchor_idx: (topk,) int32 anchor row indices.
        mask: (topk,) bool — True for entries that passed ``score_thr``.
    """
    n, c = scores.shape
    flat = scores.reshape(-1)
    valid = flat > score_thr
    masked = jnp.where(valid, flat, -jnp.inf)
    k = min(topk, n * c) if topk > 0 else n * c
    top_scores, top_idx = jax.lax.top_k(masked, k)
    mask = top_scores > -jnp.inf
    anchor_idx = (top_idx // c).astype(jnp.int32)
    labels = (top_idx % c).astype(jnp.int32)
    top_scores = jnp.where(mask, top_scores, 0.0)
    return top_scores, labels, anchor_idx, mask


def topk_mask_select(criterion, cap, threshold):
    """Select entries with ``criterion > threshold``, capped at ``cap``.

    The static-shape analogue of ``mask.nonzero()`` selection (ERS,
    gfl_increment_erd.py:151,159): take the top-``cap`` entries by criterion
    and mark the ones actually above the threshold. Returns (idx (cap,),
    mask (cap,)).
    """
    top_vals, top_idx = jax.lax.top_k(criterion,
                                      min(cap, criterion.shape[-1]))
    mask = top_vals > threshold
    return top_idx.astype(jnp.int32), mask


def masked_mean_std(x, mask, ddof=1, eps=1e-12):
    """Mean and sample std over masked entries (torch .std() uses ddof=1)."""
    mask = mask.astype(x.dtype)
    cnt = jnp.maximum(mask.sum(), 1.0)
    mean = (x * mask).sum() / cnt
    var = (jnp.square(x - mean) * mask).sum() / jnp.maximum(cnt - ddof, 1.0)
    return mean, jnp.sqrt(jnp.maximum(var, eps))


def cap_candidates(scores, valid, k, *arrays):
    """Keep the top-``k`` valid entries by score; gather companion arrays.

    Returns (scores (k,), valid (k,), *gathered arrays). Used to bound the
    candidate count entering fixed-shape NMS.
    """
    k = min(k, scores.shape[0])
    masked = jnp.where(valid, scores, -jnp.inf)
    top, idx = jax.lax.top_k(masked, k)
    new_valid = top > -jnp.inf
    out = [jnp.where(new_valid, top, 0.0), new_valid]
    for a in arrays:
        out.append(a[idx])
    return tuple(out)


def unmap(data, count, inds, fill=0):
    """Scatter ``data`` rows to a ``count``-row canvas at ``inds``."""
    shape = (count,) + data.shape[1:]
    out = jnp.full(shape, fill, dtype=data.dtype)
    return out.at[inds].set(data)
