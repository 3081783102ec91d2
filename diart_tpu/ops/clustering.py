"""Incremental online speaker clustering as a pure, fixed-shape device op.

TPU-native redesign of the reference's ``OnlineSpeakerClustering``
(``/root/reference/src/diart/blocks/clustering.py:10-218``), which keeps
Python sets and runs data-dependent loops on the host. Here the whole
algorithm is expressed with masks over fixed shapes so a single jitted step
can be ``vmap``-ed over hundreds of concurrent streams:

* centroid matrix is always ``(max_speakers, dim)`` (the reference also
  allocates it densely, ``clustering.py:81``), with an ``active`` mask
  replacing the ``active_centers`` set;
* speaker gating (tau/rho, ``clustering.py:137-145``) becomes boolean masks
  over the ``K`` local speakers;
* the Hungarian assignment runs on device (:mod:`diart_tpu.ops.assignment`);
* the sequential "missed speaker" resolution (``clustering.py:170-194``) is a
  statically unrolled loop over the (small, static) ``K`` local speakers.

Semantics parity notes (vs the reference, verified by simulation tests):

* The reference re-runs the Hungarian solver lazily every time a
  ``SpeakerMap`` is modified (``mapping.py:194-199``). Two of those
  re-solves can CHANGE assignments and are mirrored here exactly: (1)
  after ``unmap_threshold`` invalidates over-delta rows, the surviving
  rows re-solve without them and may move to cheaper columns (the second
  ``assign_rows`` call below); (2) each fallback pin occupies a
  previously-unassigned column, which cannot improve any surviving row's
  assignment (if a free column had beaten a row's assigned column, the
  joint optimum would already have used it), so no further re-solve is
  needed — matching the oracle's final ``valid_assignments``.
  Tie-breaking can still differ on degenerate (exactly-equal-cost)
  inputs.
* ``blocked_centers`` exists in the reference but nothing ever populates it,
  so it is omitted here.
* First-chunk capacity: when a first chunk has more active speakers than
  centroid slots, the extra speakers are left unmapped here. (The
  reference corrupts its centroid matrix in that configuration —
  ``add_center`` broadcast-assigns on a ``None`` slot; the host oracle
  guards it the same way this op does.)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .assignment import assign_rows

__all__ = ["ClusteringState", "ClusteringParams", "init_state", "cluster_step"]

_BIG = 1e10


class ClusteringParams(NamedTuple):
    """Static clustering hyper-parameters (tau/rho/delta as in
    ``blocks/base.py:45-47``)."""

    tau_active: float
    rho_update: float
    delta_new: float


class ClusteringState(NamedTuple):
    """Per-stream clustering state (a pytree; batched by vmap).

    centers: (max_speakers, dim) — running *sums* of embeddings per centroid,
        exactly like the reference (``clustering.py:96-99``): cosine distance
        is scale-invariant so sums behave like means.
    active: (max_speakers,) bool — which centroid slots are in use.
    initialized: () bool — whether the first chunk has been seen
        (the reference models this with ``centers is None``,
        ``clustering.py:149``).
    """

    centers: jnp.ndarray
    active: jnp.ndarray
    initialized: jnp.ndarray


def init_state(max_speakers: int, dim: int, dtype=jnp.float32) -> ClusteringState:
    return ClusteringState(
        centers=jnp.zeros((max_speakers, dim), dtype=dtype),
        active=jnp.zeros((max_speakers,), dtype=bool),
        initialized=jnp.zeros((), dtype=bool),
    )


def _cosine_cdist(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    return 1.0 - jnp.dot(
        xn,
        yn.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def cluster_step(
    state: ClusteringState,
    segmentation: jnp.ndarray,
    embeddings: jnp.ndarray,
    params: ClusteringParams,
) -> Tuple[ClusteringState, jnp.ndarray, jnp.ndarray]:
    """Advance clustering by one chunk; return permuted segmentation.

    Functional equivalent of ``OnlineSpeakerClustering.__call__``
    (``clustering.py:212-218``): identifies the global centroid of each local
    speaker, updates centroids, and projects local scores onto global
    speaker columns.

    Parameters
    ----------
    state: ClusteringState for one stream.
    segmentation: (frames, K) local speaker activations.
    embeddings: (K, dim) local speaker embeddings.
    params: tau/rho/delta thresholds.

    Returns
    -------
    new_state: ClusteringState
    permuted: (frames, max_speakers) — local scores on global speaker columns
        (zeros for unmapped locals), as in ``mapping.py:341-360``.
    targets: (K,) int32 — global index per local speaker, -1 if unmapped
        (useful for debugging / tests).
    """
    num_local = segmentation.shape[1]
    max_speakers = state.centers.shape[0]

    # --- gating (clustering.py:137-145) -------------------------------- #
    active = jnp.max(segmentation, axis=0) >= params.tau_active  # (K,)
    long = jnp.mean(segmentation, axis=0) >= params.rho_update  # (K,)
    no_nan = ~jnp.any(jnp.isnan(embeddings), axis=1)
    active = active & no_nan
    emb = jnp.nan_to_num(embeddings)

    # --- first chunk: adopt active speakers as centroids ---------------- #
    # (clustering.py:149-158: every *active* speaker gets a centroid,
    # regardless of rho)
    def init_branch():
        order = jnp.cumsum(active) - 1  # position among active speakers
        # capacity clamp: a first chunk with more active speakers than
        # centroid slots leaves the overflow unmapped (-1) instead of
        # emitting out-of-range targets
        tgt = jnp.where(active & (order < max_speakers), order, -1).astype(
            jnp.int32
        )
        onehot = (tgt[:, None] == jnp.arange(max_speakers)[None, :]) & active[:, None]
        centers = jnp.dot(
            onehot.astype(emb.dtype).T,
            emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(state.centers.dtype)
        center_active = jnp.any(onehot, axis=0)
        new_state = ClusteringState(
            centers=centers,
            active=center_active,
            initialized=jnp.ones((), dtype=bool),
        )
        return new_state, tgt

    # --- subsequent chunks (clustering.py:160-210) ----------------------- #
    def normal_branch():
        dist = _cosine_cdist(emb, state.centers)  # (K, M)
        col_ok = state.active
        row_ok = active
        # dist_map after unmap_speakers(inactive_locals, inactive_centers)
        cost = jnp.where(row_ok[:, None] & col_ok[None, :], dist, _BIG)

        assigned_col = assign_rows(cost)  # (K,)
        assigned_cost = jnp.take_along_axis(cost, assigned_col[:, None], axis=1)[:, 0]

        # loose "mapped" check: row has at least one valid entry
        mapped = row_ok & jnp.any(col_ok)
        # unmap_threshold(delta_new) (clustering.py:168, mapping.py:260-273):
        # the threshold is evaluated ONCE, on the joint solve's costs
        valid = mapped & (assigned_cost < params.delta_new)
        missed = active & ~valid

        # The reference's SpeakerMap re-solves lazily after the over-delta
        # rows are invalidated (mapping.py:123-127, 190-200): surviving
        # rows may move to columns the joint solve had traded away to a
        # row that then failed the threshold (e.g. rows [[.5,.6],[.75,1.3]]
        # at delta .7: the joint solve pairs row0->col1/row1->col0, row1
        # fails, and the re-solve returns row0 to col0). Solve again with
        # only the surviving rows; their (un-re-thresholded) assignments
        # are the oracle's final ones.
        cost2 = jnp.where(valid[:, None], cost, _BIG)
        assigned_col = assign_rows(cost2)

        free_slots = max_speakers - jnp.sum(state.active)

        # Sequential resolution of missed speakers (clustering.py:175-194).
        # K is a small static constant, so unroll in Python.
        tgt = jnp.where(valid, assigned_col, -1)
        taken = jnp.any(
            (tgt[:, None] == jnp.arange(max_speakers)[None, :]) & valid[:, None],
            axis=0,
        )

        new_center_flag = jnp.zeros((num_local,), dtype=bool)
        new_count = jnp.zeros((), dtype=jnp.int32)
        for k in range(num_local):
            is_missed = missed[k]
            has_space = new_count < free_slots
            make_new = is_missed & has_space & long[k]
            new_center_flag = new_center_flag.at[k].set(make_new)
            new_count = new_count + make_new.astype(jnp.int32)

            # fallback: closest active center not already taken
            # (preferences from the *unthresholded* distances, clustering.py:185)
            pref = jnp.where(col_ok & ~taken, cost[k], jnp.inf)
            best = jnp.argmin(pref)
            can_fallback = is_missed & ~make_new & (pref[best] < _BIG)
            tgt = tgt.at[k].set(jnp.where(can_fallback, best.astype(jnp.int32), tgt[k]))
            taken = taken.at[best].set(taken[best] | can_fallback)

        # Centroid updates (clustering.py:197-202): the oracle filters its
        # final assignments by "not missed and long"; valid rows are never
        # missed, so the mask reduces to valid & long
        update_mask = valid & long
        onehot_upd = (
            (tgt[:, None] == jnp.arange(max_speakers)[None, :]) & update_mask[:, None]
        )
        centers = state.centers + jnp.dot(
            onehot_upd.astype(emb.dtype).T,
            emb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(state.centers.dtype)

        # New centers claim free slots in order (clustering.py:205-209,
        # get_next_center_position scans slots left to right, :68-71)
        center_active = state.active
        for k in range(num_local):
            make_new = new_center_flag[k]
            slot = jnp.argmin(center_active)  # first inactive slot
            centers = jnp.where(
                make_new,
                centers.at[slot].set(emb[k].astype(centers.dtype)),
                centers,
            )
            tgt = tgt.at[k].set(jnp.where(make_new, slot.astype(jnp.int32), tgt[k]))
            center_active = center_active.at[slot].set(center_active[slot] | make_new)

        new_state = ClusteringState(
            centers=centers,
            active=center_active,
            initialized=state.initialized,
        )
        return new_state, tgt.astype(jnp.int32)

    new_state, targets = jax.lax.cond(
        state.initialized, normal_branch, init_branch
    )

    # map.apply (mapping.py:341-360): project local scores onto global columns
    proj = (
        (targets[:, None] == jnp.arange(max_speakers)[None, :]) & (targets >= 0)[:, None]
    ).astype(segmentation.dtype)
    permuted = jnp.dot(
        segmentation,
        proj,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(segmentation.dtype)
    return new_state, permuted, targets
