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

    is_active = data > threshold
    padded = np.concatenate([is_active, np.zeros((1, num_speakers), dtype=bool)])
    annotation = Annotation(uri=uri, modality="speech")
    track = 0
    for spk in range(num_speakers):
        col = padded[:, spk]
        # onsets: False -> True transition at index t+1 starts a turn there;
        # an active first frame starts at middles[0] (blocks/utils.py:48).
        diff = np.diff(col.astype(np.int8))
        onset_idx = np.where(diff == 1)[0] + 1
        offset_idx = np.where(diff == -1)[0] + 1
        if col[0]:
            onset_idx = np.concatenate([[0], onset_idx])
        for s, e in zip(onset_idx, offset_idx):
            annotation[Segment(middles[s], middles[e]), track] = f"speaker{spk}"
            track += 1
    return annotation
