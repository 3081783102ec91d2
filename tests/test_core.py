"""Unit tests for segments, sliding windows, annotations and RTTM I/O."""

import io

import numpy as np
import pytest

from diart_tpu.core import (
    Annotation,
    Segment,
    SlidingWindow,
    SlidingWindowFeature,
    Timeline,
    load_rttm,
)


class TestSegment:
    def test_basic(self):
        s = Segment(1.0, 3.0)
        assert s.duration == 2.0
        assert s.middle == 2.0
        assert bool(s)
        assert not Segment(2.0, 2.0)
        assert not Segment(3.0, 1.0)

    def test_ops(self):
        a, b = Segment(0, 2), Segment(1, 3)
        assert (a & b) == Segment(1, 2)
        assert (a | b) == Segment(0, 3)
        assert a.intersects(b)
        assert not Segment(0, 1).intersects(Segment(1, 2))


class TestSlidingWindow:
    def test_frames(self):
        sw = SlidingWindow(duration=2.0, step=1.0, start=10.0)
        assert sw[0] == Segment(10.0, 12.0)
        assert sw[3] == Segment(13.0, 15.0)

    def test_crop_loose_fixed(self):
        # frames of res seconds, duration == step (diart's score grids)
        res = 0.1
        sw = SlidingWindow(duration=res, step=res, start=0.0)
        # focus [0.5, 1.0], fixed=0.5: loose includes partial frames
        i, j = sw.crop_range(Segment(0.5, 1.0), mode="loose", fixed=0.5)
        # i = ceil((0.5 - 0.1)/0.1) = 4; n = floor((0.5+0.1)/0.1) = 6.
        # The 10-decimal rounding guard resolves the float boundary
        # ((0.5+0.1)/0.1 = 5.999...) to its exact value, deterministically.
        assert (i, j) == (4, 10)

    def test_crop_strict(self):
        sw = SlidingWindow(duration=0.1, step=0.1, start=0.0)
        i, j = sw.crop_range(Segment(0.5, 1.0), mode="strict", fixed=0.5)
        # i = ceil(0.5/0.1) = 5, n = floor((0.5-0.1)/0.1)+1 = 5
        assert (i, j) == (5, 10)

    def test_crop_negative_start(self):
        sw = SlidingWindow(duration=0.1, step=0.1, start=0.0)
        i, j = sw.crop_range(Segment(0.0, 1.0), mode="loose", fixed=1.0)
        # i = ceil((0 - 0.1)/0.1) = -1: out-of-range, feature pads
        assert i == -1

    def test_diart_aggregation_geometry(self):
        # The exact geometry from the flagship config: 5s chunks, 293 frames,
        # focus = last 0.5s of a 5s chunk with latency 0.5.
        frames, duration, step = 293, 5.0, 0.5
        res = duration / frames
        sw = SlidingWindow(duration=res, step=res, start=0.0)
        i, j = sw.crop_range(Segment(4.5, 5.0), mode="loose", fixed=0.5)
        assert i == int(np.ceil(4.5 / res - 1))
        n = j - i
        assert n == int(np.floor((0.5 + res) / res))
        assert j <= frames  # fits inside the chunk


class TestSlidingWindowFeature:
    def test_crop_pads_edges(self):
        sw = SlidingWindow(duration=0.1, step=0.1, start=0.0)
        data = np.arange(10, dtype=float).reshape(10, 1)
        feat = SlidingWindowFeature(data, sw)
        cropped = feat.crop(Segment(0.0, 1.0), mode="loose", fixed=1.0)
        # first index is -1 -> repeat first frame
        assert cropped.shape[0] == 11
        assert cropped[0, 0] == 0.0 and cropped[1, 0] == 0.0
        assert cropped[-1, 0] == 9.0

    def test_extent(self):
        sw = SlidingWindow(duration=1.0, step=0.5, start=2.0)
        feat = SlidingWindowFeature(np.zeros((4, 2)), sw)
        assert feat.extent == Segment(2.0, 2.0 + 3 * 0.5 + 1.0)


class TestTimeline:
    def test_support_collar(self):
        tl = Timeline([Segment(0, 1), Segment(1.02, 2), Segment(3, 4)])
        merged = tl.support(0.05)
        assert list(merged) == [Segment(0, 2), Segment(3, 4)]

    def test_duration_overlap_counted_once(self):
        tl = Timeline([Segment(0, 2), Segment(1, 3)])
        assert tl.duration() == pytest.approx(3.0)

    def test_gaps(self):
        tl = Timeline([Segment(1, 2), Segment(3, 4)])
        gaps = tl.gaps(Segment(0, 5))
        assert list(gaps) == [Segment(0, 1), Segment(2, 3), Segment(4, 5)]


class TestAnnotation:
    def test_tracks(self):
        ann = Annotation(uri="test")
        ann[Segment(0, 1), 0] = "alice"
        ann[Segment(0.5, 2), 1] = "bob"
        assert ann.labels() == ["alice", "bob"]
        segs = list(ann.itersegments())
        assert segs == [Segment(0, 1), Segment(0.5, 2)]

    def test_support_merges_same_label(self):
        ann = Annotation()
        ann[Segment(0, 1), 0] = "a"
        ann[Segment(1.01, 2), 1] = "a"
        ann[Segment(0, 2), 2] = "b"
        out = ann.support(0.05)
        assert out.label_timeline("a").duration() == pytest.approx(2.0)
        assert len(list(out.label_timeline("a"))) == 1

    def test_update_overwrites(self):
        a = Annotation()
        a[Segment(0, 1), 0] = "x"
        b = Annotation()
        b[Segment(0, 1), 0] = "y"
        b[Segment(2, 3), 1] = "z"
        a.update(b)
        labels = [l for _, _, l in a.itertracks(yield_label=True)]
        assert labels == ["y", "z"]

    def test_extrude(self):
        ann = Annotation()
        ann[Segment(0, 4), 0] = "a"
        out = ann.extrude(Segment(1, 2))
        segs = sorted(out.itersegments())
        assert segs == [Segment(0, 1), Segment(2, 4)]

    def test_shift(self):
        ann = Annotation()
        ann[Segment(1, 2), 0] = "a"
        out = ann.shift(-0.5)
        assert list(out.itersegments()) == [Segment(0.5, 1.5)]

    def test_rttm_roundtrip(self, tmp_path):
        ann = Annotation(uri="conv1")
        ann[Segment(0.0, 1.5), 0] = "speaker0"
        ann[Segment(1.0, 2.0), 1] = "speaker1"
        path = tmp_path / "conv1.rttm"
        with open(path, "w") as f:
            ann.write_rttm(f)
        loaded = load_rttm(path)["conv1"]
        assert loaded.labels() == ["speaker0", "speaker1"]
        segs = list(loaded.itersegments())
        assert segs[0].start == pytest.approx(0.0)
        assert segs[0].end == pytest.approx(1.5)

    def test_rttm_format(self):
        ann = Annotation(uri="u")
        ann[Segment(0.5, 2.0), 0] = "speaker0"
        buf = io.StringIO()
        ann.write_rttm(buf)
        line = buf.getvalue().strip().split()
        assert line[0] == "SPEAKER" and line[1] == "u"
        assert float(line[3]) == 0.5 and float(line[4]) == 1.5


class TestCenterCrop:
    def test_center_uses_closest_frame(self):
        """Center-mode crops pick the frame whose *center* is nearest the
        focus bound (pyannote closest_frame / np.rint), not ceil/floor —
        ceil would shift this crop right by one frame."""
        from diart_tpu.core import Segment, SlidingWindow

        sw = SlidingWindow(start=0.0, duration=2.0, step=1.0)
        i, j = sw.crop_range(Segment(1.3, 3.2), mode="center")
        assert (i, j) == (0, 3)
        # fixed variant anchors at the same rounded start
        i2, j2 = sw.crop_range(Segment(1.3, 3.2), mode="center", fixed=2.0)
        assert i2 == 0 and j2 == i2 + sw.samples(2.0, mode="center")

    def test_center_half_step_boundary(self):
        from diart_tpu.core import Segment, SlidingWindow

        sw = SlidingWindow(start=0.0, duration=1.0, step=0.5)
        # focus.start exactly between two frame centers: np.rint rounds to
        # even, matching pyannote
        i, _ = sw.crop_range(Segment(0.75, 2.0), mode="center")
        assert i == int(np.rint((0.75 - 0.5) / 0.5))
