"""Linear sum assignment on device, without host synchronization.

The reference solves local->global speaker assignment with scipy's Hungarian
algorithm on the host (``/root/reference/src/diart/mapping.py:15-16``), which
would force a device->host sync inside the streaming hot loop. Here the
problem is tiny — ``rows = local speakers <= 4``, ``cols = max global
speakers ~ 20`` — so we solve it exactly on device by enumeration.

Optimality of the candidate reduction: for a rectangular min-cost assignment
with ``R`` rows (all assigned) and ``C >= R`` columns, there is always an
optimal solution where each row is assigned to one of its ``R`` cheapest
columns. Proof sketch: if row ``r`` were assigned a column outside its ``R``
cheapest, then among those ``R`` cheaper columns at most ``R-1`` are taken by
other rows, so one is free; swapping ``r`` to it does not increase the cost.
Hence enumerating the ``R**R`` combinations of per-row candidate ranks (and
masking combinations that reuse a column) covers an optimal solution.

``R**R`` is 256 for the default 4 local speakers — a trivial reduction for
the VPU, fully vmappable across streams.

TPU note: the math is deliberately GATHER-FREE. Dynamic gathers over tiny
arrays lower to scalar-core loops on TPU (profiled at ~3 ms per step for
the batch-256 engine — a quarter of the whole step); candidate selection is
expressed instead as iterative masked argmin -> one-hot, and combination
lookup as einsums against a trace-time-constant rank-selection tensor, all
of which vectorize on the VPU/MXU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["assign_rows", "assign_rows_host"]

# Costs at or above this value are treated as "invalid" sentinels (the
# clustering layer uses 1e10, matching the reference's convention,
# mapping.py:49-52).
_INVALID_THRESHOLD = 1e9


@lru_cache(maxsize=None)
def _rank_combinations(num_rows: int) -> np.ndarray:
    """All ``num_rows**num_rows`` tuples of per-row candidate ranks."""
    grids = np.meshgrid(*[np.arange(num_rows)] * num_rows, indexing="ij")
    return np.stack([g.reshape(-1) for g in grids], axis=-1)  # (R^R, R)


@lru_cache(maxsize=None)
def _rank_selection_tensor(num_rows: int) -> np.ndarray:
    """(N, R, R) one-hot over ranks: ``S[n, r, k] = combos[n, r] == k``."""
    return np.eye(num_rows, dtype=np.float32)[_rank_combinations(num_rows)]


def assign_rows(cost: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost assignment of every row to a distinct column.

    Device-side equivalent of
    ``scipy.optimize.linear_sum_assignment(cost)[1]`` for ``R <= C``.

    Parameters
    ----------
    cost: (R, C) float matrix, R <= C. R must be small (<= ~6).

    Returns
    -------
    cols: (R,) int32 — the column assigned to each row.
    """
    num_rows, num_cols = cost.shape
    if num_rows > num_cols:
        raise ValueError(f"need rows <= cols, got {cost.shape}")
    if num_rows > 6:
        # the exhaustive combination ranking below is R^R: fine for the
        # <=4 local speakers this serves, but 8 rows would silently build
        # a ~17M-combination selection tensor at trace time
        raise ValueError(
            f"assign_rows ranks R^R candidate assignments and is meant for "
            f"R <= 6 rows; got R = {num_rows}"
        )
    if num_rows == 1:
        return jnp.argmin(cost, axis=1).astype(jnp.int32)

    f32 = jnp.float32
    cost_f = cost.astype(f32)
    # (R, K=R, C) one-hots of each row's K cheapest columns, built by
    # iterative masked argmin (stable lowest-index tie-break, same order as
    # a stable argsort). No gathers: argmin is a plain reduction.
    work = cost_f
    cand = []
    for _ in range(num_rows):
        oh = jax.nn.one_hot(jnp.argmin(work, axis=1), num_cols, dtype=f32)
        cand.append(oh)
        work = jnp.where(oh > 0, jnp.inf, work)
    cand_oh = jnp.stack(cand, axis=1)  # (R, K, C)

    # Column picked by combination n for row r, as one-hots over C:
    # contraction with the static rank-selection tensor (VPU/MXU-friendly).
    sel_tensor = jnp.asarray(_rank_selection_tensor(num_rows))  # (N, R, K)
    sel = jnp.einsum("nrk,rkc->nrc", sel_tensor, cand_oh)  # (N, R, C) 0/1

    # Mask combinations that assign two rows to the same column: a column
    # used more than once shows up as a >1 entry in the per-column usage.
    valid = jnp.max(jnp.sum(sel, axis=1), axis=1) <= 1.5

    # Sentinel-invalidated entries (>= ~1e9, see ops.clustering) must rank
    # lexicographically: fewer invalid picks first, then lower real cost.
    # Summing raw sentinels would absorb the real part in float32
    # (1e10 + 0.9 == 1e10), silently breaking tie resolution.
    picked = jnp.einsum("nrc,rc->nr", sel, cost_f)  # (N, R)
    is_invalid = picked >= _INVALID_THRESHOLD
    real_total = jnp.sum(jnp.where(is_invalid, 0.0, picked), axis=1)
    inv_count = jnp.sum(is_invalid, axis=1).astype(f32)
    # weight strictly dominating any achievable real total
    weight = 2.0 * num_rows * jnp.maximum(
        jnp.max(jnp.where(cost_f >= _INVALID_THRESHOLD, 0.0, jnp.abs(cost_f))), 1.0
    ) + 1.0
    totals = jnp.where(valid, inv_count * weight + real_total, jnp.inf)
    # Recover the winning combination's columns without a dynamic gather:
    # contract its one-hot selection back out, then argmax over C.
    best_oh = jax.nn.one_hot(jnp.argmin(totals), sel.shape[0], dtype=f32)
    sel_best = jnp.einsum("n,nrc->rc", best_oh, sel)
    return jnp.argmax(sel_best, axis=1).astype(jnp.int32)


def assign_rows_host(cost: np.ndarray) -> np.ndarray:
    """Host reference using scipy (for parity tests and the host-exact path)."""
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(np.asarray(cost))[1]
