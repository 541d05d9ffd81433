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
