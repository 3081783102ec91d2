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

__all__ = ["binarize"]


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

    # One 2D transition pass for ALL speakers: pad an inactive frame on both
    # sides, then +1/-1 edges of the diff are turn onsets/offsets. An active
    # first frame starts at middles[0] (blocks/utils.py:48). Transposing
    # before nonzero yields speaker-major order, so onsets and offsets pair
    # elementwise (counts match per speaker: every run inside the padding
    # opens and closes). This is called once per stream per hop on hot
    # serving paths — per-column numpy calls dominated at 256 streams.
    ext = np.zeros((num_frames + 2, num_speakers), np.int8)
    ext[1:-1] = data > threshold
    d = np.diff(ext.T, axis=1)
    on_spk, on_idx = np.nonzero(d == 1)
    _, off_idx = np.nonzero(d == -1)

    annotation = Annotation(uri=uri, modality="speech")
    labels = [f"speaker{spk}" for spk in range(num_speakers)]
    for track in range(on_spk.size):
        seg = Segment(middles[on_idx[track]], middles[off_idx[track]])
        annotation[seg, track] = labels[on_spk[track]]
    return annotation
