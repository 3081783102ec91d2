"""Latency-controlled overlap-add aggregation with static gather geometry.

The reference aggregates the ``[end - latency, end - latency + step]`` region
of the last ``round(latency/step)`` sliding windows with Hamming-weighted
averaging (``/root/reference/src/diart/blocks/aggregation.py:73-92,214-218``).
Its implementation re-crops python-object buffers per chunk on the host.

On TPU the crop indices are *static*: the focus offset inside a buffer of age
``a`` (0 = newest) is ``duration - latency + a*step`` — independent of wall
time. This module precomputes, for every warm-up phase ``c`` (number of
buffers seen so far, 1..W) and every age, the frame gather indices and
Hamming weights, so the jitted streaming step aggregates with one gather and
one weighted reduction, no host sync.

The reference's first-chunk prepend hack (``aggregation.py:188-212``) — the
first output is extended to cover ``[0, duration - latency + step]`` using
the (cropped) first buffer — is reproduced via a second static index set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core.segment import Segment, SlidingWindow

__all__ = ["AggregationGeometry", "build_geometry", "aggregate"]


class AggregationGeometry(NamedTuple):
    """Static aggregation plan for one (duration, step, latency, frames).

    Attributes
    ----------
    num_windows: W = round(latency / step) overlapping windows.
    num_out: frames in each aggregated output region.
    indices: (W, W, num_out) int32 — ``indices[c-1, a]`` are the frame
        indices to gather from the buffer of age ``a`` when ``c`` buffers
        are present (clipped to the chunk, emulating edge padding).
    weights: (W, W, num_out) f32 — matching aggregation weights
        (zero rows for absent ages; Hamming, mean or first-only).
    first_num_out: frames of the extended first-chunk output.
    first_indices: (first_num_out,) int32 — gather into the first buffer for
        the prepended region (edge-padded), whose tail gets overwritten by
        the aggregated output.
    step_duration / latency / duration: the time geometry, for building
        output timestamps downstream.
    """

    num_windows: int
    num_out: int
    indices: np.ndarray
    weights: np.ndarray
    first_num_out: int
    first_indices: np.ndarray
    duration: float
    step: float
    latency: float

    @property
    def out_resolution(self) -> float:
        return self.step / self.num_out

    @property
    def first_resolution(self) -> float:
        first_region = self.duration - self.latency + self.step
        return first_region / self.first_num_out


def build_geometry(
    duration: float,
    step: float,
    latency: float,
    num_frames: int,
    strategy: str = "hamming",
    cropping_mode: str = "loose",
) -> AggregationGeometry:
    """Precompute gather indices and weights for delayed aggregation.

    Matches ``DelayedAggregation`` semantics (``aggregation.py:120-218``)
    for score buffers laid on a ``duration/num_frames`` grid.
    """
    assert strategy in ("hamming", "mean", "first"), strategy
    num_windows = int(round(latency / step))
    res = duration / num_frames

    # Canonical absolute layout: newest buffer starts at (W-1)*step, so the
    # oldest possible buffer starts at 0 (this matches the warm-up phases of
    # a stream starting at t=0; indices are t-invariant by construction).
    t_new = (num_windows - 1) * step
    focus = Segment(t_new + duration - latency, t_new + duration - latency + step)

    ref_sw = SlidingWindow(duration=res, step=res, start=0.0)
    num_out = ref_sw.samples(step, mode=cropping_mode)

    hamming = np.hamming(num_frames)

    indices = np.zeros((num_windows, num_windows, num_out), dtype=np.int32)
    weights = np.zeros((num_windows, num_windows, num_out), dtype=np.float32)
    for c in range(1, num_windows + 1):
        for a in range(c):  # age 0 = newest
            sw = SlidingWindow(duration=res, step=res, start=t_new - a * step)
            i, j = sw.crop_range(focus, mode=cropping_mode, fixed=step)
            idx = np.clip(np.arange(i, j), 0, num_frames - 1)
            indices[c - 1, a] = idx
            if strategy == "hamming":
                weights[c - 1, a] = hamming[idx]
            elif strategy == "mean":
                weights[c - 1, a] = 1.0
            else:  # first: oldest buffer only (aggregation.py:111-117)
                weights[c - 1, a] = 1.0 if a == c - 1 else 0.0

    # First-chunk prepend (aggregation.py:188-212): region [0, D - L + S]
    # cropped loose+fixed from the first buffer (which starts at 0).
    first_region = Segment(0.0, duration - latency + step)
    sw0 = SlidingWindow(duration=res, step=res, start=0.0)
    i0, j0 = sw0.crop_range(first_region, mode=cropping_mode, fixed=first_region.duration)
    first_indices = np.clip(np.arange(i0, j0), 0, num_frames - 1).astype(np.int32)

    return AggregationGeometry(
        num_windows=num_windows,
        num_out=num_out,
        indices=indices,
        weights=weights,
        first_num_out=len(first_indices),
        first_indices=first_indices,
        duration=duration,
        step=step,
        latency=latency,
    )


def aggregate(
    geometry: AggregationGeometry,
    buffers: jnp.ndarray,
    count: jnp.ndarray,
) -> jnp.ndarray:
    """Aggregate a ring of prediction buffers into the focus region.

    Jittable equivalent of ``DelayedAggregation.__call__``
    (``aggregation.py:214-218``) minus the first-chunk prepend (handled by
    the caller with :attr:`AggregationGeometry.first_indices`).

    Parameters
    ----------
    geometry: static plan from :func:`build_geometry`.
    buffers: (W, frames, dims) — age-ordered (index 0 = newest).
    count: () int32 — how many buffers are valid (1..W).

    Returns
    -------
    (num_out, dims) aggregated scores.
    """
    phase = jnp.clip(count, 1, geometry.num_windows) - 1
    idx = jnp.asarray(geometry.indices)[phase]  # (W, num_out)
    w = jnp.asarray(geometry.weights)[phase]  # (W, num_out)
    gathered = jnp.take_along_axis(buffers, idx[:, :, None], axis=1)
    num = jnp.sum(w[:, :, None] * gathered, axis=0)
    den = jnp.sum(w, axis=0)[:, None]
    return num / jnp.maximum(den, 1e-30)
