"""Hungarian (optimal bipartite) assignment for set-prediction heads.

Mirrors /root/reference/mmdet/models/task_modules/assigners/
hungarian_assigner.py + match_costs: a cost matrix combining classification
NLL, normalized-L1 box and GIoU terms is solved exactly. The solver runs
host-side through ``jax.pure_callback`` (scipy's Jonker-Volgenant) on the
small fixed-size (num_queries, MAX_GT) matrices — padded gt columns carry a
huge cost and assignments into them are masked out afterwards, keeping
everything static-shape on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e6


def _solve_host(cost: np.ndarray) -> np.ndarray:
    """(B, Q, G) -> (B, Q) assigned gt index or -1."""
    from scipy.optimize import linear_sum_assignment
    cost = np.asarray(cost)
    b, q, g = cost.shape
    out = np.full((b, q), -1, np.int32)
    for i in range(b):
        rows, cols = linear_sum_assignment(cost[i])
        for r, c in zip(rows, cols):
            if cost[i, r, c] < BIG / 2:  # ignore padded-gt columns
                out[i, r] = c
    return out


def hungarian_match(cost, gt_mask):
    """cost (B, Q, G); gt_mask (B, G) -> (B, Q) gt index or -1.

    Gradients do not flow through the assignment (matching is
    non-differentiable and detached in the reference too).
    """
    cost = jax.lax.stop_gradient(cost)
    cost = jnp.where(gt_mask[:, None, :], cost, BIG)
    b, q, _ = cost.shape
    return jax.pure_callback(
        _solve_host,
        jax.ShapeDtypeStruct((b, q), jnp.int32),
        cost, vmap_method='sequential')
