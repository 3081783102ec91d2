"""Tests for DER / detection error rate against hand-computed values."""

import pytest

from diart_tpu.core import Annotation, Segment
from diart_tpu.metrics import DetectionErrorRate, DiarizationErrorRate


def make(uri, turns):
    ann = Annotation(uri=uri)
    for i, (start, end, label) in enumerate(turns):
        ann[Segment(start, end), i] = label
    return ann


class TestDER:
    def test_perfect(self):
        ref = make("u", [(0, 10, "a"), (10, 20, "b")])
        hyp = make("u", [(0, 10, "x"), (10, 20, "y")])
        der = DiarizationErrorRate()
        assert der(ref, hyp) == pytest.approx(0.0)

    def test_duplicate_same_label_tracks_count_once(self):
        """A speaker annotated in several overlapping tracks is ONE active
        speaker: a perfect hypothesis scores 0, not an inflated
        total/miss (regression: duplicate tracks used to count as
        multiple active reference speakers)."""
        ref = make("u", [(0, 10, "a"), (5, 10, "a")])
        hyp = make("u", [(0, 10, "x")])
        der = DiarizationErrorRate()
        assert der(ref, hyp, detailed=True)["total"] == pytest.approx(10.0)
        assert abs(der) == pytest.approx(0.0)
        # and overlapping same-label hypothesis tracks add no false alarm
        ref2 = make("u", [(0, 10, "a")])
        hyp2 = make("u", [(0, 10, "x"), (5, 10, "x")])
        assert DiarizationErrorRate()(ref2, hyp2) == pytest.approx(0.0)

    def test_miss_only(self):
        ref = make("u", [(0, 10, "a")])
        hyp = make("u", [(0, 5, "x")])
        der = DiarizationErrorRate()
        # 5s missed over 10s total
        assert der(ref, hyp) == pytest.approx(0.5)

    def test_false_alarm_only(self):
        ref = make("u", [(0, 10, "a")])
        hyp = make("u", [(0, 10, "x"), (10, 15, "x")])
        der = DiarizationErrorRate()
        assert der(ref, hyp) == pytest.approx(0.5)

    def test_confusion(self):
        # hyp swaps speakers in the second half: mapping picks the dominant
        ref = make("u", [(0, 10, "a"), (10, 20, "b")])
        hyp = make("u", [(0, 10, "x"), (10, 16, "x"), (16, 20, "y")])
        der = DiarizationErrorRate()
        # x -> a (10s overlap beats 6s with b); y unmapped... y->b (4s)
        # confusion = 6s (x during b's region), total 20
        assert der(ref, hyp) == pytest.approx(6 / 20)

    def test_overlap_scoring(self):
        # two simultaneous ref speakers, hyp only finds one
        ref = make("u", [(0, 10, "a"), (0, 10, "b")])
        hyp = make("u", [(0, 10, "x")])
        der = DiarizationErrorRate()
        # total = 20, miss = 10
        assert der(ref, hyp) == pytest.approx(0.5)

    def test_optimal_mapping(self):
        ref = make("u", [(0, 10, "a"), (10, 20, "b")])
        hyp = make("u", [(0, 9, "x"), (10, 20, "y")])
        der = DiarizationErrorRate()
        mapping = der.optimal_mapping(ref, hyp)
        assert mapping == {"x": "a", "y": "b"}

    def test_collar(self):
        ref = make("u", [(0, 10, "a")])
        hyp = make("u", [(0.2, 10, "x")])
        strict = DiarizationErrorRate(collar=0.0)
        lenient = DiarizationErrorRate(collar=0.5)
        assert strict(ref, hyp) > 0
        assert lenient(ref, hyp) == pytest.approx(0.0)

    def test_accumulation_and_report(self):
        der = DiarizationErrorRate()
        ref1 = make("f1", [(0, 10, "a")])
        hyp1 = make("f1", [(0, 10, "x")])
        ref2 = make("f2", [(0, 10, "a")])
        hyp2 = make("f2", [(0, 5, "x")])
        der(ref1, hyp1)
        der(ref2, hyp2)
        assert abs(der) == pytest.approx(5 / 20)
        report = der.report()
        assert report.loc["TOTAL", der.name]["%"] == pytest.approx(25.0)
        assert "f1" in report.index and "f2" in report.index

    def test_empty_hypothesis(self):
        ref = make("u", [(0, 10, "a")])
        hyp = Annotation(uri="u")
        der = DiarizationErrorRate()
        assert der(ref, hyp) == pytest.approx(1.0)


class TestDetectionErrorRate:
    def test_perfect(self):
        ref = make("u", [(0, 10, "a"), (5, 12, "b")])
        hyp = make("u", [(0, 12, "speech")])
        det = DetectionErrorRate()
        assert det(ref, hyp) == pytest.approx(0.0)

    def test_miss_and_fa(self):
        ref = make("u", [(0, 10, "a")])
        hyp = make("u", [(5, 12, "speech")])
        det = DetectionErrorRate()
        # speech support = 10s; miss [0,5]=5, fa [10,12]=2
        assert det(ref, hyp) == pytest.approx(7 / 10)
