"""Replay / exemplar-memory scoring (iCaRL-style).

Mirrors the self-contained replay helper on the reference's GFL detector
(/root/reference/mmdet/models/detectors/gfl.py:70-88,
``compute_cost_for_memory_icarl``): per-image feature vector = mean over all
spatial positions of every FPN level, concatenated on the channel axis and
mean-pooled. The sibling hooks ``compute_cost_for_memory`` /
``compute_importance_for_replay_v3/v4`` (gfl.py:49-65,91-126) delegate to
HEAD methods that are not implemented anywhere in the reference (dead
experimental code — SURVEY.md section 2.1); they are intentionally not
reproduced. On top of the faithful feature extractor this module adds the
standard iCaRL herding selection, which is what an exemplar memory actually
needs.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def icarl_image_features(detector, variables, images) -> jnp.ndarray:
    """(B, C) mean-pooled FPN feature embedding per image.

    Matches gfl.py:87: concat of per-level (B, C, H*W) then mean over the
    flattened spatial axis — i.e. the mean over ALL positions of all levels
    of the (shared-width) pyramid.
    """
    feats = detector.net.apply(variables, detector.preprocessor(images),
                               return_feats=True)
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    flat = jnp.concatenate(
        [f.reshape(b, -1, c) for f in feats], axis=1)  # (B, sum HW, C)
    return flat.mean(axis=1).astype(jnp.float32)


def herding_selection(features: np.ndarray, budget: int) -> List[int]:
    """iCaRL herding: greedily pick exemplars whose running mean best
    approximates the class mean of ``features`` (n, d). Returns indices."""
    features = np.asarray(features, np.float64)
    n = len(features)
    budget = min(budget, n)
    mu = features.mean(axis=0)
    chosen: List[int] = []
    acc = np.zeros_like(mu)
    remaining = set(range(n))
    for k in range(1, budget + 1):
        best, best_d = None, np.inf
        for i in remaining:
            d = np.linalg.norm(mu - (acc + features[i]) / k)
            if d < best_d:
                best, best_d = i, d
        chosen.append(best)
        acc += features[best]
        remaining.remove(best)
    return chosen
