"""Exact earth-mover's distance for the dynamic-target OT problems.

Replaces POT's `ot.emd` (exp-3-debias-gender-race/1-main-debias.py:1531,
exp-6-debias-race/1-main-debias.py:1480). The reference's problems all have
unit source masses (a = ones(N)) and integer target masses b with
sum(b) == N, so an integral optimal plan exists and the LP reduces to a
min-cost assignment on the column-expanded cost matrix — solved exactly by
scipy's Jonker-Volgenant `linear_sum_assignment`. This is host-side math on
tiny matrices (N<=~40, C<=16) between jitted phases; exactness (not
Sinkhorn) preserves the reference's target semantics bit-for-bit.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def emd_assignment(b: np.ndarray, cost: np.ndarray, *, native: bool = True) -> np.ndarray:
    """Optimal transport plan between a = ones(N) and integer masses b.

    Args:
      b: [C] non-negative integers, sum(b) == N.
      cost: [N, C] cost matrix.
    Returns:
      plan: [N, C] 0/1 matrix with row sums 1 and column sums b.
    """
    b = np.asarray(b)
    cost = np.asarray(cost, dtype=np.float64)
    n, c = cost.shape
    if int(b.sum()) != n:
        raise ValueError(f"mass mismatch: sum(b)={int(b.sum())} != N={n}")
    if native:
        from fairdiff.native.emd_lib import emd_assignment_native

        plan = emd_assignment_native(b, cost)
        if plan is not None:
            return plan
    col_of = np.repeat(np.arange(c), b)  # expanded column -> class
    expanded = cost[:, col_of]  # [N, N]
    rows, cols = linear_sum_assignment(expanded)
    plan = np.zeros((n, c))
    plan[rows, col_of[cols]] = 1.0
    return plan


def emd_batch(bs: np.ndarray, cost: np.ndarray) -> np.ndarray:
    """Solve D EMDs against one cost matrix (the sampled-OT inner loop,
    exp-3:1528-1532): bs [D, C] -> plans [D, N, C]. Uses the native C++
    solver when available."""
    from fairdiff.native.emd_lib import emd_batch_native

    plans = emd_batch_native(np.asarray(bs), np.asarray(cost))
    if plans is not None:
        return plans
    return np.stack([emd_assignment(b, cost, native=False) for b in bs])


def emd_value(b: np.ndarray, cost: np.ndarray) -> float:
    plan = emd_assignment(b, cost)
    return float((plan * cost).sum())
