"""Frame scores -> continuous speaker turns (host-side, vectorized).

Equivalent of the reference's ``Binarize`` block
(``/root/reference/src/diart/blocks/utils.py:11-59``): a speaker turn starts
at the first frame above the threshold and ends at the first frame at or
below it; turn boundaries are placed at frame *middles*. The reference scans
frames in a Python loop; this version vectorizes onset/offset detection with
numpy (the input is a small, latency-delayed score window, so this runs on
the host right before RTTM emission — no reason to burn device cycles).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.annotation import Annotation
from ..core.segment import Segment, SlidingWindowFeature

__all__ = [
    "binarize",
    "binarize_rttm",
    "batch_binarize_rttm",
    "batch_bits_rttm",
    "pack_binarized_bits",
    "packed_stride",
]


def _transitions(data: np.ndarray, threshold: float):
    """Onset/offset frame indices for one stream's (frames, speakers)
    scores — the shared core of both emission routes, so the thresholding
    semantics ('strictly greater-than') can never diverge between them.

    One 2D transition pass for ALL speakers: pad an inactive frame on both
    sides, then +1/-1 edges of the diff are turn onsets/offsets. An active
    first frame starts a turn at the first frame middle
    (blocks/utils.py:48). Transposing before nonzero yields speaker-major
    order, so onsets and offsets pair elementwise (counts match per
    speaker: every run inside the padding opens and closes)."""
    num_frames, num_speakers = data.shape
    ext = np.zeros((num_frames + 2, num_speakers), np.int8)
    ext[1:-1] = data > threshold
    d = np.diff(ext.T, axis=1)
    on_spk, on_idx = np.nonzero(d == 1)
    _, off_idx = np.nonzero(d == -1)
    return on_spk, on_idx, off_idx


def binarize(
    scores: SlidingWindowFeature,
    threshold: float,
    uri: Optional[str] = None,
) -> Annotation:
    """Threshold per-frame speaker scores into an annotation.

    Parameters
    ----------
    scores: (frames, speakers) windowed scores.
    threshold: activation threshold (strictly greater-than, as in the
        reference's ``segmentation.data > self.threshold``).
    uri: stream identifier for the output annotation.

    Returns
    -------
    Annotation with labels ``speaker0..speakerN-1``.
    """
    data = np.asarray(scores.data)
    num_frames, num_speakers = data.shape
    sw = scores.sliding_window

    # Frame-middle timestamps; one artificial inactive frame closes open turns
    # (blocks/utils.py:46-47).
    middles = sw.start + np.arange(num_frames + 1) * sw.step + 0.5 * sw.duration
    on_spk, on_idx, off_idx = _transitions(data, threshold)

    annotation = Annotation(uri=uri, modality="speech")
    labels = [f"speaker{spk}" for spk in range(num_speakers)]
    for track in range(on_spk.size):
        seg = Segment(middles[on_idx[track]], middles[off_idx[track]])
        annotation[seg, track] = labels[on_spk[track]]
    return annotation


def _rttm_lines(uri, starts, ends, speakers, track0=0):
    """RTTM text for one stream's turns, exactly as
    ``binarize(...).to_rttm()`` would produce it: empty segments dropped
    (``Annotation.__setitem__`` skips them), lines sorted by
    (start, end, str(track)) — ``Annotation.itertracks``'s sort key, where
    track ids enumerate turns in speaker-major order BEFORE the empty-drop
    (``binarize`` increments its loop counter for skipped segments too)."""
    u = uri if uri else "<NA>"
    entries = [
        (starts[t], ends[t], str(track0 + t), int(speakers[t]))
        for t in range(len(starts))
        if ends[t] - starts[t] > 0
    ]
    entries.sort(key=lambda e: (e[0], e[1], e[2]))
    return "".join(
        f"SPEAKER {u} 1 {s:.3f} {e - s:.3f} <NA> <NA> speaker{k} <NA> <NA>\n"
        for s, e, _, k in entries
    )


def binarize_rttm(
    scores: SlidingWindowFeature,
    threshold: float,
    uri: Optional[str] = None,
) -> str:
    """``binarize(scores, threshold, uri).to_rttm()`` without materializing
    the ``Annotation``/``Segment`` objects.

    The serving hot path only ships RTTM text back over the wire; at 256
    streams per hop the per-turn object churn of the annotation route costs
    more host time than the device step (measured: 14.9 ms/hop for smooth
    2-speaker activity, 355 ms/hop for dense score matrices — vs an
    ~11.9 ms device step). String equality with the annotation route is
    pinned by tests/test_ops.py."""
    data = np.asarray(scores.data)
    num_frames = data.shape[0]
    sw = scores.sliding_window
    middles = sw.start + np.arange(num_frames + 1) * sw.step + 0.5 * sw.duration
    on_spk, on_idx, off_idx = _transitions(data, threshold)
    return _rttm_lines(uri, middles[on_idx], middles[off_idx], on_spk)


def batch_binarize_rttm(
    data: np.ndarray,
    window_starts: np.ndarray,
    resolution: float,
    threshold: float,
    uris,
) -> list:
    """Per-stream RTTM text for a whole hop in ONE transition pass.

    data: (B, frames, speakers) scores whose windows share one
    ``resolution`` (= duration = step) but start at per-stream times
    ``window_starts`` — the steady-state serving shape. Equivalent to
    ``[binarize_rttm(SWF(data[i], SW(start_i, res, res)), threshold,
    uris[i]) for i in range(B)]`` but the thresholding/edge detection runs
    once over the batch: per-stream numpy fixed costs (~30 us x 6 calls)
    dominated the per-stream route at serving batch sizes."""
    return _batch_rttm_from_active(
        np.asarray(data) > threshold, window_starts, resolution, uris
    )


def packed_stride(frames: int, speakers: int) -> int:
    """Bytes per stream of the packed (frames, speakers) binarized map."""
    return (frames * speakers + 7) // 8


def pack_binarized_bits(scores, threshold):
    """Jittable: (B, frames, speakers) scores -> (B, packed_stride) uint8.

    The serving fetch path's device half: thresholding runs on DEVICE with
    the exact comparison the host route performs (numpy 2 / NEP 50 casts a
    Python-float threshold to the array dtype, so an f32 ``>`` on device is
    bit-identical to ``fetched_f32 > python_float`` on the host), and the
    per-hop device->host fetch shrinks ~30x: 8 bits of "active" per
    (frame, speaker) cell instead of an f32 score. Bit order matches
    ``np.unpackbits`` (MSB first) over the frame-major flattened map."""
    import jax.numpy as jnp

    b, frames, speakers = scores.shape
    nbits = frames * speakers
    stride = packed_stride(frames, speakers)
    bits = (scores > threshold).reshape(b, nbits)
    pad = stride * 8 - nbits
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    b8 = bits.reshape(b, stride, 8).astype(jnp.int32)
    return (b8 * weights).sum(-1).astype(jnp.uint8)


def batch_bits_rttm(
    bits: np.ndarray,
    frames: int,
    speakers: int,
    window_starts: np.ndarray,
    resolution: float,
    uris,
) -> list:
    """``batch_binarize_rttm`` over a device-binarized packed bitmap
    (``pack_binarized_bits`` output fetched to host). Pure-numpy fallback
    for the native assembler (``native.rttm_from_bits``)."""
    flat = np.unpackbits(np.ascontiguousarray(bits), axis=1, count=frames * speakers)
    return _batch_rttm_from_active(
        flat.reshape(bits.shape[0], frames, speakers), window_starts,
        resolution, uris,
    )


def _batch_rttm_from_active(
    active: np.ndarray,
    window_starts: np.ndarray,
    resolution: float,
    uris,
) -> list:
    """Shared tail of both batch routes: (B, frames, speakers) boolean
    activity -> per-stream RTTM text."""
    b, num_frames, num_speakers = active.shape
    ext = np.zeros((b, num_frames + 2, num_speakers), np.int8)
    ext[:, 1:-1] = active
    # speaker-major WITHIN each stream (transpose frames<->speakers) so the
    # nonzero enumeration order matches binarize's per-stream track ids
    d = np.diff(ext.transpose(0, 2, 1), axis=2)
    on_b, on_spk, on_idx = np.nonzero(d == 1)
    off_b, _, off_idx = np.nonzero(d == -1)
    # frame middles: start_i + idx*step + 0.5*duration with step = duration
    # = res, in binarize's exact operation order so the float64 results
    # (and their %.3f renderings) are bit-identical
    starts = window_starts[on_b] + on_idx * resolution + 0.5 * resolution
    ends = window_starts[off_b] + off_idx * resolution + 0.5 * resolution
    out = []
    lo = 0
    bounds = np.searchsorted(on_b, np.arange(1, b + 1))
    for i in range(b):
        hi = bounds[i]
        out.append(
            _rttm_lines(uris[i], starts[lo:hi], ends[lo:hi], on_spk[lo:hi])
        )
        lo = hi
    return out
