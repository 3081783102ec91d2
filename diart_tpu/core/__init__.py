from .segment import Segment, SlidingWindow, SlidingWindowFeature
from .annotation import Annotation, Timeline, load_rttm, write_rttm

__all__ = [
    "Segment",
    "SlidingWindow",
    "SlidingWindowFeature",
    "Annotation",
    "Timeline",
    "load_rttm",
    "write_rttm",
]
