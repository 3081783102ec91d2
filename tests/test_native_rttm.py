"""Parity of the native (C++) RTTM assembler and the device-binarized
bit-packed fetch against the Python oracle routes.

The serving hot path (`MultiStreamSession.push_finish_rttm`) now runs
threshold -> turns -> RTTM through `native/rttm.cpp` on a DEVICE-binarized
packed bitmap (`ops.binarize.pack_binarized_bits`). Every claim rests on
exact string parity with `ops.binarize.batch_binarize_rttm`, which is
itself pinned against the annotation route
(tests/test_ops.py::TestBinarize::test_rttm_fast_path_exact) — reference
semantics: /root/reference/src/diart/blocks/utils.py:11-59.
"""

import numpy as np
import pytest

from diart_tpu import native
from diart_tpu.ops.binarize import (
    batch_binarize_rttm,
    batch_bits_rttm,
    pack_binarized_bits,
    packed_stride,
)

RES = 5.0 / 293.0  # the production out_resolution's irrational-ish flavor
TAU = 0.6

needs_native = pytest.mark.skipif(
    not native.rttm_available(), reason="no C++ toolchain for librttm"
)


def _random_case(rng, b, f, s, dense=False):
    if dense:
        # per-frame flips: maximal turn count (the worst case PERF.md
        # quotes at >100 ms/hop for the pure-Python route)
        scores = rng.uniform(0, 1, (b, f, s)).astype(np.float32)
    else:
        scores = np.zeros((b, f, s), np.float32)
        for i in range(b):
            for k in range(rng.integers(0, 4)):
                spk = rng.integers(0, s)
                a = rng.integers(0, f)
                scores[i, a : a + rng.integers(1, f), spk] = rng.uniform(
                    0.61, 1.0
                )
    starts = rng.uniform(-3, 1000, b)
    uris = [
        None if i % 5 == 0 else ("u" * 600 if i % 7 == 3 else f"stream/{i}")
        for i in range(b)
    ]
    return scores, starts, uris


class TestNativeScores:
    @needs_native
    @pytest.mark.parametrize("dense", [False, True])
    def test_matches_python_batch(self, dense):
        rng = np.random.default_rng(3 + dense)
        for b, f, s in [(1, 5, 1), (9, 29, 20), (4, 64, 4)]:
            scores, starts, uris = _random_case(rng, b, f, s, dense)
            py = batch_binarize_rttm(scores, starts, RES, TAU, uris)
            nat = native.rttm_from_scores(scores, starts, RES, TAU, uris)
            assert nat == py

    @needs_native
    def test_threshold_strictly_greater(self):
        scores = np.full((1, 6, 2), np.float32(TAU))  # == tau: inactive
        scores[0, 2:4, 1] = 0.9
        py = batch_binarize_rttm(scores, np.zeros(1), RES, TAU, ["u"])
        nat = native.rttm_from_scores(scores, np.zeros(1), RES, TAU, ["u"])
        assert nat == py
        assert py[0].count("\n") == 1  # only the 0.9 run

    @needs_native
    def test_emit_mask_and_empty(self):
        rng = np.random.default_rng(11)
        scores, starts, uris = _random_case(rng, 8, 29, 20)
        emit = np.array([True, False] * 4)
        nat = native.rttm_from_scores(
            scores, starts, RES, TAU, uris, emit=emit
        )
        py = batch_binarize_rttm(scores, starts, RES, TAU, uris)
        for i in range(8):
            assert nat[i] == (py[i] if emit[i] else None)
        # all-inactive stream -> empty string, not None
        silent = np.zeros((1, 29, 20), np.float32)
        assert native.rttm_from_scores(silent, np.zeros(1), RES, TAU, ["u"]) == [""]

    @needs_native
    def test_huge_values_render_like_python(self):
        # > 1e12 takes fmt3's snprintf fallback; a double's %.3f can run
        # to ~313 chars. Regression: the fallback used to truncate at 24
        # bytes while reporting the untruncated length, emitting
        # NUL-corrupted text (and reading past the line buffer) for
        # values >= ~1e19.
        rng = np.random.default_rng(13)
        scores = (rng.uniform(0, 1, (4, 6, 3)) > 0.5).astype(np.float32)
        for mag in (1e12, 1e19, 1e30, 1e300):
            starts = np.array([0.0, mag, -mag, mag * 1.7])
            py = batch_binarize_rttm(scores, starts, RES, TAU, ["u"] * 4)
            nat = native.rttm_from_scores(scores, starts, RES, TAU, ["u"] * 4)
            assert nat == py
        # huge resolution too (both operands of the rendered subtraction)
        py = batch_binarize_rttm(scores, np.zeros(4), 1e22, TAU, ["u"] * 4)
        nat = native.rttm_from_scores(scores, np.zeros(4), 1e22, TAU, ["u"] * 4)
        assert nat == py

    @needs_native
    def test_sort_tie_uses_track_string_order(self):
        # catastrophic absorption: a huge window start collapses all turn
        # times to the same float, so the sort falls through to
        # str(track) — "10" < "2" etc. Python and C must agree exactly.
        rng = np.random.default_rng(12)
        scores = (rng.uniform(0, 1, (2, 8, 20)) > 0.5).astype(np.float32)
        starts = np.full(2, 1e15)
        uris = ["a", "b"]
        py = batch_binarize_rttm(scores, starts, RES, TAU, uris)
        nat = native.rttm_from_scores(scores, starts, RES, TAU, uris)
        assert nat == py


class TestPackedBits:
    def test_pack_matches_numpy_packbits(self):
        rng = np.random.default_rng(5)
        for b, f, s in [(3, 29, 20), (2, 7, 1), (1, 4, 3)]:
            scores = rng.uniform(0, 1, (b, f, s)).astype(np.float32)
            packed = np.asarray(pack_binarized_bits(scores, np.float32(TAU)))
            ref = np.packbits(
                (scores > np.float32(TAU)).reshape(b, -1), axis=1
            )
            pad = packed_stride(f, s) - ref.shape[1]
            if pad:
                ref = np.pad(ref, ((0, 0), (0, pad)))
            assert packed.dtype == np.uint8
            np.testing.assert_array_equal(packed, ref)

    @pytest.mark.parametrize("use_native", [False, True])
    def test_bits_route_matches_scores_route(self, use_native):
        if use_native and not native.rttm_available():
            pytest.skip("no C++ toolchain")
        rng = np.random.default_rng(6)
        for dense in (False, True):
            scores, starts, uris = _random_case(rng, 6, 29, 20, dense)
            packed = np.asarray(pack_binarized_bits(scores, np.float32(TAU)))
            py = batch_binarize_rttm(scores, starts, RES, TAU, uris)
            if use_native:
                got = native.rttm_from_bits(
                    packed, 29, 20, starts, RES, uris
                )
            else:
                got = batch_bits_rttm(packed, 29, 20, starts, RES, uris)
            assert got == py
