"""Host-only A/B of the RTTM assembly routes at the serving hop shape.

Python oracle (`ops.binarize.batch_binarize_rttm`, one numpy transition
pass + per-turn f-strings) vs the native C++ assembler
(`native/rttm.cpp`, scores and packed-bits entry points). Two workloads:

* smooth — a few long turns per stream (typical speech activity);
* dense  — per-frame random scores, maximal turn count (the worst case
  PERF.md quoted at >100 ms/hop for the annotation route and ~127 ms for
  the Python fast path).

No device involved; run anywhere. ``python scripts/rttm_native_bench.py``.
"""

import sys
import time
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

from diart_tpu import native  # noqa: E402
from diart_tpu.ops.binarize import (  # noqa: E402
    batch_binarize_rttm,
    batch_bits_rttm,
    packed_stride,
)

B, F, S = 256, 29, 20
RES = 5.0 / 293.0
TAU = 0.6


def _smooth(rng):
    scores = np.zeros((B, F, S), np.float32)
    for i in range(B):
        for spk in rng.choice(S, 2, replace=False):
            a = rng.integers(0, F - 5)
            scores[i, a : a + rng.integers(5, F - a), spk] = 0.9
    return scores


def _time(fn, reps=30):
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best.append(time.perf_counter() - t0)
    return float(np.median(best)) * 1e3


def main():
    rng = np.random.default_rng(0)
    starts = rng.uniform(0, 1000, B)
    uris = [f"stream{i}" for i in range(B)]
    for name, scores in (
        ("smooth", _smooth(rng)),
        ("dense", rng.uniform(0, 1, (B, F, S)).astype(np.float32)),
    ):
        packed = np.packbits((scores > np.float32(TAU)).reshape(B, -1), axis=1)
        pad = packed_stride(F, S) - packed.shape[1]
        if pad:
            packed = np.pad(packed, ((0, 0), (0, pad)))
        py = batch_binarize_rttm(scores, starts, RES, TAU, uris)
        turns = sum(t.count("\n") for t in py)

        rows = {
            "python scores": lambda: batch_binarize_rttm(
                scores, starts, RES, TAU, uris
            ),
            "python bits": lambda: batch_bits_rttm(
                packed, F, S, starts, RES, uris
            ),
        }
        if native.rttm_available():
            rows["native scores"] = lambda: native.rttm_from_scores(
                scores, starts, RES, TAU, uris
            )
            rows["native bits"] = lambda: native.rttm_from_bits(
                packed, F, S, starts, RES, uris
            )
            assert rows["native scores"]() == py
            assert rows["native bits"]() == py
        print(f"# {name}: batch={B} frames={F} speakers={S} turns/hop={turns}")
        for label, fn in rows.items():
            print(f"  {label:14s} {_time(fn):8.3f} ms/hop")


if __name__ == "__main__":
    main()
