"""Proposal samplers, static-shape.

Mirrors the reference sampler semantics
(/root/reference/mmdet/models/task_modules/samplers/): PseudoSampler (no
subsampling; folded into the dense target builders) and RandomSampler
(random positive/negative subsets with a positive fraction). Random choice
without replacement is realized as top-k over random keys, masked — the
static-shape equivalent of ``random_choice``.

Documented deviation: slot counts are static (``num*pos_fraction`` positive
slots, the rest negative), so when positives are scarce the reference fills
the gap with EXTRA negatives while we leave those slots masked; loss
normalizers use the actual sampled count, keeping gradients consistent.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    idx: jnp.ndarray       # (num,) indices into the candidate set
    is_pos: jnp.ndarray    # (num,) bool
    valid: jnp.ndarray     # (num,) bool


def ohem_sample(losses, pos_mask, neg_mask, num=512, pos_fraction=0.25):
    """Online Hard Example Mining: pick the HIGHEST-loss candidates
    (ohem_sampler.py semantics) instead of random ones."""
    n = pos_mask.shape[0]
    n_pos_slots = int(num * pos_fraction)
    n_neg_slots = num - n_pos_slots
    pos_keys = jnp.where(pos_mask, losses, -jnp.inf)
    neg_keys = jnp.where(neg_mask, losses, -jnp.inf)
    pos_top, pos_idx = jax.lax.top_k(pos_keys, min(n_pos_slots, n))
    neg_top, neg_idx = jax.lax.top_k(neg_keys, min(n_neg_slots, n))
    idx = jnp.concatenate([pos_idx, neg_idx])
    is_pos = jnp.concatenate([jnp.ones_like(pos_idx, dtype=bool),
                              jnp.zeros_like(neg_idx, dtype=bool)])
    valid = jnp.concatenate([pos_top > -jnp.inf, neg_top > -jnp.inf])
    return SampleResult(idx=idx.astype(jnp.int32), is_pos=is_pos,
                        valid=valid)


def random_sample(rng, pos_mask, neg_mask, num=512, pos_fraction=0.25):
    """Sample up to num*pos_fraction positives and fill with negatives."""
    n = pos_mask.shape[0]
    n_pos_slots = int(num * pos_fraction)
    n_neg_slots = num - n_pos_slots
    kp, kn = jax.random.split(rng)
    pos_keys = jnp.where(pos_mask, jax.random.uniform(kp, (n,)), -jnp.inf)
    neg_keys = jnp.where(neg_mask, jax.random.uniform(kn, (n,)), -jnp.inf)
    pos_top, pos_idx = jax.lax.top_k(pos_keys, min(n_pos_slots, n))
    neg_top, neg_idx = jax.lax.top_k(neg_keys, min(n_neg_slots, n))
    idx = jnp.concatenate([pos_idx, neg_idx])
    is_pos = jnp.concatenate([jnp.ones_like(pos_idx, dtype=bool),
                              jnp.zeros_like(neg_idx, dtype=bool)])
    valid = jnp.concatenate([pos_top > -jnp.inf, neg_top > -jnp.inf])
    return SampleResult(idx=idx.astype(jnp.int32), is_pos=is_pos,
                        valid=valid)


def iou_balanced_neg_sample(rng, pos_mask, neg_mask, max_overlaps, num=512,
                            pos_fraction=0.25, num_bins=3,
                            floor_thr=0.0, neg_iou_ceiling=0.5):
    """Libra R-CNN IoU-balanced negative sampling
    (reference task_modules/samplers/iou_balanced_neg_sampler.py):
    negatives are drawn uniformly from ``num_bins`` equal IoU intervals of
    [floor_thr, neg_iou_ceiling) so hard (high-IoU) negatives are not
    drowned out by easy ones. Static-shape: per-bin top-k over random keys
    with per-bin quotas; unfilled bin slots fall back to the global
    negative pool (matching the reference's "extend with random" path).
    Positives are sampled like RandomSampler.
    """
    n = pos_mask.shape[0]
    n_pos_slots = int(num * pos_fraction)
    n_neg_slots = num - n_pos_slots
    kp, kn, kf = jax.random.split(rng, 3)

    pos_keys = jnp.where(pos_mask, jax.random.uniform(kp, (n,)), -jnp.inf)
    pos_top, pos_idx = jax.lax.top_k(pos_keys, min(n_pos_slots, n))

    per_bin = n_neg_slots // num_bins
    keys = jax.random.uniform(kn, (n,))
    neg_parts_idx = []
    neg_parts_val = []
    taken = jnp.zeros(n, bool)
    width = (neg_iou_ceiling - floor_thr) / num_bins
    for b in range(num_bins):
        lo = floor_thr + b * width
        hi = floor_thr + (b + 1) * width
        in_bin = neg_mask & (max_overlaps >= lo) & (max_overlaps < hi)
        quota = per_bin if b < num_bins - 1 else \
            n_neg_slots - per_bin * (num_bins - 1)
        kb = jnp.where(in_bin, keys, -jnp.inf)
        top, idx = jax.lax.top_k(kb, min(quota, n))
        ok = top > -jnp.inf
        neg_parts_idx.append(idx)
        neg_parts_val.append(ok)
        taken = taken.at[idx].set(taken[idx] | ok)
    neg_idx = jnp.concatenate(neg_parts_idx)
    neg_val = jnp.concatenate(neg_parts_val)
    # fallback: fill invalid bin slots from untaken negatives
    fill_keys = jnp.where(neg_mask & ~taken, jax.random.uniform(kf, (n,)),
                          -jnp.inf)
    f_top, f_idx = jax.lax.top_k(fill_keys, neg_idx.shape[0])
    f_ok = f_top > -jnp.inf
    use_fill = ~neg_val & f_ok
    neg_idx = jnp.where(use_fill, f_idx, neg_idx)
    neg_val = neg_val | use_fill

    idx = jnp.concatenate([pos_idx, neg_idx])
    is_pos = jnp.concatenate([jnp.ones_like(pos_idx, dtype=bool),
                              jnp.zeros_like(neg_idx, dtype=bool)])
    valid = jnp.concatenate([pos_top > -jnp.inf, neg_val])
    return SampleResult(idx=idx.astype(jnp.int32), is_pos=is_pos,
                        valid=valid)


def instance_balanced_pos_sample(rng, pos_mask, gt_idx, num_gts_cap,
                                 n_pos_slots):
    """Libra R-CNN instance-balanced positive sampling
    (instance_balanced_pos_sampler.py): positive quota split evenly across
    gt instances. Static form: per-gt random top-k with quota
    ceil(slots / num_instances); overflow slots fall back to the global
    positive pool.
    """
    n = pos_mask.shape[0]
    keys = jax.random.uniform(jax.random.fold_in(rng, 7), (n,))
    # rank = number of same-gt positives with a larger key
    same_gt = (gt_idx[:, None] == gt_idx[None, :]) & pos_mask[None, :] & \
        pos_mask[:, None]
    rank = (same_gt & (keys[None, :] > keys[:, None])).sum(axis=1)
    # number of distinct instances holding at least one positive
    num_inst = jnp.maximum(
        jax.nn.one_hot(jnp.where(pos_mask, gt_idx, num_gts_cap),
                       num_gts_cap + 1).max(axis=0)[:num_gts_cap].sum(), 1.0)
    quota = jnp.ceil(n_pos_slots / num_inst).astype(jnp.int32)
    preferred = pos_mask & (rank < quota)
    # preferred first, then the rest by key
    order_key = jnp.where(preferred, keys + 2.0,
                          jnp.where(pos_mask, keys, -jnp.inf))
    top, idx = jax.lax.top_k(order_key, n_pos_slots)
    return idx.astype(jnp.int32), top > -jnp.inf


def score_hlr_sample(rng, pos_mask, neg_mask, fg_scores, num=512,
                     pos_fraction=0.25, score_thr=0.05, k=0.5, bias=0.0):
    """Score-based hard negative sampling (reference
    task_modules/samplers/score_hlr_sampler.py), static-shape form.

    Negatives whose max foreground score exceeds ``score_thr`` are ranked
    by score (the reference additionally groups by NMS before ranking —
    the grouping is omitted here, documented deviation) and receive
    importance weights (1 - rank/n_valid)^k + bias; sampling draws
    negatives by perturbed-key top-k proportional to that importance, and
    the weights are returned so the loss can downweight easy negatives
    exactly like the reference's neg_label_weights.
    """
    n = pos_mask.shape[0]
    n_pos_slots = int(num * pos_fraction)
    n_neg_slots = num - n_pos_slots
    kp, kn = jax.random.split(rng)
    pos_keys = jnp.where(pos_mask, jax.random.uniform(kp, (n,)), -jnp.inf)
    pos_top, pos_idx = jax.lax.top_k(pos_keys, min(n_pos_slots, n))

    valid = neg_mask & (fg_scores > score_thr)
    order_score = jnp.where(valid, fg_scores, -jnp.inf)
    rank = jnp.argsort(jnp.argsort(-order_score))
    n_valid = jnp.maximum(valid.sum().astype(jnp.float32), 1.0)
    imp = jnp.power(jnp.clip(1.0 - rank.astype(jnp.float32) / n_valid,
                             0.0, 1.0), k) + bias
    # perturbed top-k: keys = importance * uniform for valid; tiny uniform
    # for easy negatives so they fill leftover slots
    u = jax.random.uniform(kn, (n,), minval=1e-6, maxval=1.0)
    keys = jnp.where(valid, imp * u,
                     jnp.where(neg_mask, 1e-6 * u, -jnp.inf))
    neg_top, neg_idx = jax.lax.top_k(keys, min(n_neg_slots, n))
    neg_weights = jnp.where(valid[neg_idx], imp[neg_idx], 1.0)

    idx = jnp.concatenate([pos_idx, neg_idx])
    is_pos = jnp.concatenate([jnp.ones_like(pos_idx, dtype=bool),
                              jnp.zeros_like(neg_idx, dtype=bool)])
    valid_slots = jnp.concatenate([pos_top > -jnp.inf, neg_top > -jnp.inf])
    return SampleResult(idx=idx.astype(jnp.int32), is_pos=is_pos,
                        valid=valid_slots), neg_weights
