"""Speaker annotations, timelines and RTTM input/output.

Self-contained replacements for the subset of ``pyannote.core.Annotation`` /
``Timeline`` behaviour the reference framework uses (see
``/root/reference/src/diart/sinks.py`` and ``blocks/diarization.py:212-227``):
track assignment, ``update``, ``support(collar)``, ``extrude``, timeline
conversion, label renaming, and RTTM serialization.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, Iterator, List, Optional, Tuple, Union

from .segment import Segment

__all__ = ["Timeline", "Annotation", "load_rttm", "write_rttm"]


class Timeline:
    """An ordered set of segments (possibly overlapping)."""

    def __init__(self, segments: Optional[Iterable[Segment]] = None, uri: Optional[str] = None):
        self.uri = uri
        self._segments: List[Segment] = sorted(s for s in (segments or []) if s)

    def add(self, segment: Segment) -> "Timeline":
        if segment:
            self._segments.append(segment)
            self._segments.sort()
        return self

    def __iter__(self) -> Iterator[Segment]:
        return iter(self._segments)

    def __len__(self) -> int:
        return len(self._segments)

    def __bool__(self) -> bool:
        return len(self._segments) > 0

    def __eq__(self, other) -> bool:
        return isinstance(other, Timeline) and self._segments == other._segments

    def extent(self) -> Segment:
        if not self._segments:
            return Segment(0.0, 0.0)
        return Segment(
            min(s.start for s in self._segments),
            max(s.end for s in self._segments),
        )

    def duration(self) -> float:
        """Total duration of the *support* (overlaps counted once)."""
        total = 0.0
        for seg in self.support():
            total += seg.duration
        return total

    def support(self, collar: float = 0.0) -> "Timeline":
        """Merge overlapping/touching segments, and segments separated by a
        gap STRICTLY smaller than ``collar`` — pyannote.core's support_iter
        semantics (an exactly-collar gap stays split there, so ``<=`` here
        would diverge from the parity target at boundary-coincident gaps)."""
        merged: List[Segment] = []
        for seg in self._segments:
            if merged:
                gap = seg.start - merged[-1].end
                if gap <= 0 or gap < collar:
                    last = merged[-1]
                    merged[-1] = Segment(last.start, max(last.end, seg.end))
                    continue
            merged.append(seg)
        out = Timeline(uri=self.uri)
        out._segments = merged
        return out

    def union(self, other: "Timeline") -> "Timeline":
        return Timeline(list(self._segments) + list(other._segments), uri=self.uri)

    def crop(self, focus: Segment) -> "Timeline":
        out = Timeline(uri=self.uri)
        for seg in self._segments:
            inter = seg & focus
            if inter:
                out.add(inter)
        return out

    def gaps(self, support: Optional[Segment] = None) -> "Timeline":
        # `is None`, not truthiness: an explicitly passed empty segment
        # must yield no gaps, not the gaps of the whole extent
        support = self.extent() if support is None else support
        out = Timeline(uri=self.uri)
        t = support.start
        for seg in self.support():
            if seg.start > t:
                out.add(Segment(t, min(seg.start, support.end)))
            t = max(t, seg.end)
            if t >= support.end:
                break
        if t < support.end:
            out.add(Segment(t, support.end))
        return out

    def to_annotation(self, labels: Union[str, Iterable[str]] = "speech") -> "Annotation":
        """Convert to an annotation; ``labels`` may be a single repeated label
        or an iterable yielding one label per segment (mirrors the reference's
        ``utils.repeat_label`` usage, ``/root/reference/src/diart/blocks/vad.py:183``).
        """
        ann = Annotation(uri=self.uri)
        if isinstance(labels, str):
            for i, seg in enumerate(self._segments):
                ann[seg, i] = labels
        else:
            it = iter(labels)
            for i, seg in enumerate(self._segments):
                ann[seg, i] = next(it)
        return ann


class Annotation:
    """A set of labeled tracks: ``(segment, track) -> label``."""

    def __init__(self, uri: Optional[str] = None, modality: Optional[str] = None):
        self.uri = uri
        self.modality = modality
        # Insertion-ordered mapping from (segment, track) to label.
        self._tracks: Dict[Tuple[Segment, Union[str, int]], str] = {}

    # ------------------------------------------------------------------ #
    # Track management
    # ------------------------------------------------------------------ #
    def __setitem__(self, key, label: str):
        if isinstance(key, tuple):
            segment, track = key
        else:
            segment, track = key, "_"
        if segment:
            self._tracks[(segment, track)] = label

    def __len__(self) -> int:
        return len(self._tracks)

    def __bool__(self) -> bool:
        return len(self._tracks) > 0

    def itertracks(
        self, yield_label: bool = False
    ) -> Iterator[Union[Tuple[Segment, Union[str, int]], Tuple[Segment, Union[str, int], str]]]:
        items = sorted(self._tracks.items(), key=lambda kv: (kv[0][0], str(kv[0][1])))
        for (segment, track), label in items:
            if yield_label:
                yield segment, track, label
            else:
                yield segment, track

    def itersegments(self) -> Iterator[Segment]:
        for segment, _ in self.itertracks():
            yield segment

    def labels(self) -> List[str]:
        return sorted({label for label in self._tracks.values()})

    def label_timeline(self, label: str) -> Timeline:
        return Timeline(
            [seg for (seg, _), lbl in self._tracks.items() if lbl == label],
            uri=self.uri,
        )

    def get_timeline(self, copy: bool = True) -> Timeline:
        return Timeline([seg for seg, _ in self._tracks.keys()], uri=self.uri)

    # ------------------------------------------------------------------ #
    # Set-like operations used by the streaming runtime
    # ------------------------------------------------------------------ #
    def update(self, other: "Annotation") -> "Annotation":
        """Add (and overwrite) all tracks from ``other`` in place."""
        for (segment, track), label in other._tracks.items():
            self._tracks[(segment, track)] = label
        return self

    def support(self, collar: float = 0.0) -> "Annotation":
        """Merge same-label segments closer than ``collar``; one track per
        merged segment (mirrors ``pyannote.core.Annotation.support``)."""
        out = Annotation(uri=self.uri, modality=self.modality)
        track_id = 0
        for label in self.labels():
            merged = self.label_timeline(label).support(collar)
            for seg in merged:
                out[seg, track_id] = label
                track_id += 1
        return out

    def extrude(self, removed: Segment) -> "Annotation":
        """Remove a time region from every track (crops segments)."""
        out = Annotation(uri=self.uri, modality=self.modality)
        for segment, track, label in self.itertracks(yield_label=True):
            if not segment.intersects(removed):
                out[segment, track] = label
                continue
            left = Segment(segment.start, min(segment.end, removed.start))
            right = Segment(max(segment.start, removed.end), segment.end)
            if left:
                out[left, track] = label
            if right:
                out[right, (track, "r") if not isinstance(track, int) else track] = label
        return out

    def crop(self, focus: Segment) -> "Annotation":
        out = Annotation(uri=self.uri, modality=self.modality)
        for segment, track, label in self.itertracks(yield_label=True):
            inter = segment & focus
            if inter:
                out[inter, track] = label
        return out

    def rename_labels(
        self, mapping: Dict[str, str], copy: bool = True
    ) -> "Annotation":
        target = Annotation(uri=self.uri, modality=self.modality) if copy else self
        items = list(self._tracks.items())
        if not copy:
            target._tracks = {}
        for (segment, track), label in items:
            target._tracks[(segment, track)] = mapping.get(label, label)
        return target

    def shift(self, offset: float) -> "Annotation":
        """Return a copy with every segment shifted by ``offset`` seconds
        (the reference re-builds annotations by hand for its timestamp shift,
        ``/root/reference/src/diart/blocks/diarization.py:215-225``)."""
        out = Annotation(uri=self.uri, modality=self.modality)
        for segment, track, label in self.itertracks(yield_label=True):
            out[Segment(segment.start + offset, segment.end + offset), track] = label
        return out

    def chart(self) -> List[Tuple[str, float]]:
        """Labels sorted by decreasing total duration."""
        durations: Dict[str, float] = {}
        for segment, _, label in self.itertracks(yield_label=True):
            durations[label] = durations.get(label, 0.0) + segment.duration
        return sorted(durations.items(), key=lambda kv: kv[1], reverse=True)

    # ------------------------------------------------------------------ #
    # RTTM
    # ------------------------------------------------------------------ #
    def write_rttm(self, file) -> None:
        uri = self.uri if self.uri else "<NA>"
        for segment, _, label in self.itertracks(yield_label=True):
            line = (
                f"SPEAKER {uri} 1 {segment.start:.3f} {segment.duration:.3f} "
                f"<NA> <NA> {label} <NA> <NA>\n"
            )
            file.write(line)

    def to_rttm(self) -> str:
        import io

        buf = io.StringIO()
        self.write_rttm(buf)
        return buf.getvalue()

    def __str__(self) -> str:
        return "\n".join(
            f"{seg} {track} {label}"
            for seg, track, label in self.itertracks(yield_label=True)
        )


def load_rttm(path: Union[str, Path]) -> Dict[str, Annotation]:
    """Parse an RTTM file into one annotation per URI (insertion-ordered)."""
    annotations: Dict[str, Annotation] = {}
    counters: Dict[str, int] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "SPEAKER":
                continue
            uri, start, dur, label = parts[1], float(parts[3]), float(parts[4]), parts[7]
            if uri not in annotations:
                annotations[uri] = Annotation(uri=uri)
                counters[uri] = 0
            annotations[uri][Segment(start, start + dur), counters[uri]] = label
            counters[uri] += 1
    return annotations


def write_rttm(annotation: Annotation, path: Union[str, Path]) -> None:
    with open(path, "w") as f:
        annotation.write_rttm(f)
