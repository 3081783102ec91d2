"""Golden-parity harness tests (VERDICT r1 item 5): scoring produced RTTM
collections against the reference's expected_outputs goldens must be a
one-command check the day real weights load."""

from pathlib import Path

import numpy as np
import pytest

from diart_tpu.metrics.parity import ParityError, load_rttm_collection, score_rttm

EXPECTED = Path("/root/reference/expected_outputs/online")


class TestScoreRttm:
    @pytest.mark.skipif(not EXPECTED.exists(), reason="reference goldens not mounted")
    def test_golden_vs_itself_is_zero(self):
        """Metric self-check on the real AMI golden: golden vs golden = 0 DER
        for every URI and in TOTAL."""
        path = EXPECTED / "1.0s" / "AMI.rttm"
        report = score_rttm(path, path)
        name = "diarization error rate"
        assert report.loc["TOTAL", (name, "%")] == pytest.approx(0.0, abs=1e-9)
        # multi-URI file: one row per AMI meeting + TOTAL
        assert len(report.index) > 2
        assert np.allclose(report[(name, "%")].to_numpy(), 0.0)

    @pytest.mark.skipif(not EXPECTED.exists(), reason="reference goldens not mounted")
    def test_different_latencies_differ(self):
        """1.0s vs 5.0s goldens are different systems: DER must be > 0."""
        report = score_rttm(EXPECTED / "1.0s" / "AMI.rttm", EXPECTED / "5.0s" / "AMI.rttm")
        assert report.loc["TOTAL", ("diarization error rate", "%")] > 1.0

    def test_directory_scoring_and_missing_reference(self, tmp_path):
        hyp = tmp_path / "hyp"
        ref = tmp_path / "ref"
        hyp.mkdir()
        ref.mkdir()
        line = "SPEAKER {uri} 1 0.00 2.00 <NA> <NA> s0 <NA> <NA>\n"
        (hyp / "a.rttm").write_text(line.format(uri="a"))
        (hyp / "b.rttm").write_text(line.format(uri="b"))
        (ref / "a.rttm").write_text(line.format(uri="a"))

        with pytest.raises(ParityError, match="no reference for URI 'b'"):
            score_rttm(hyp, ref)
        report = score_rttm(hyp, ref, allow_missing=True)
        assert report.loc["TOTAL", ("diarization error rate", "%")] == 0.0

    def test_incomplete_hypothesis_raises(self, tmp_path):
        """A truncated benchmark run (fewer hyp URIs than the golden) must
        NOT score as parity: every unscored reference URI is an error unless
        allow_missing is explicit."""
        hyp = tmp_path / "hyp"
        ref = tmp_path / "ref"
        hyp.mkdir()
        ref.mkdir()
        line = "SPEAKER {uri} 1 0.00 2.00 <NA> <NA> s0 <NA> <NA>\n"
        (hyp / "a.rttm").write_text(line.format(uri="a"))
        (ref / "a.rttm").write_text(line.format(uri="a"))
        (ref / "b.rttm").write_text(line.format(uri="b"))
        (ref / "c.rttm").write_text(line.format(uri="c"))

        with pytest.raises(ParityError, match="2 reference URI"):
            score_rttm(hyp, ref)
        report = score_rttm(hyp, ref, allow_missing=True)
        assert report.loc["TOTAL", ("diarization error rate", "%")] == 0.0

    def test_duplicate_uri_raises(self, tmp_path):
        (tmp_path / "x.rttm").write_text(
            "SPEAKER u 1 0.00 1.00 <NA> <NA> s0 <NA> <NA>\n"
        )
        (tmp_path / "y.rttm").write_text(
            "SPEAKER u 1 1.00 1.00 <NA> <NA> s0 <NA> <NA>\n"
        )
        with pytest.raises(ParityError, match="duplicate URI"):
            load_rttm_collection(tmp_path)
