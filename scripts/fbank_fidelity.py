"""On-device embedding fidelity of the fast_fbank path, per mel family.

``fast_fbank`` runs the mel-fbank DFT convolution and mel contraction at
matmul ``Precision.HIGH`` (3-pass bf16) instead of ``HIGHEST`` (6-pass).
Feature-level error was measured at <=0.026 dB in energetic bins
(``scripts/fbank_precision_bench.py``, docs/campaigns/r3/fbank_precision.
txt); this script measures what actually matters downstream: cosine
similarity of the final embedding (the serving path of
``parallel/engine.py``) against the portable f32 oracle, with the fast
path on and off.

The test signal deliberately contains near-silent stretches: the HIGH
-vs-HIGHEST divergence concentrates in quiet log-mel bins, and a pure
white-noise probe would hide it. Embeddings only feed cosine distances
for clustering (reference: ``blocks/clustering.py:170-176``), so
cosine-to-oracle is the fidelity metric that matters.

Run on the real TPU (fast_fbank is a TPU-only switch); prints one JSON
line per family.
"""

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# mel-frontend families only (xvector is SincNet — fast_fbank is a no-op)
FAMILIES = {
    "ecapa": "tpu/ecapa",
    "resnet34": "tpu/resnet34",
    "titanet": "tpu/titanet",
    "xvect-sb": "tpu/xvect-sb",
}


def _probe_waves():
    """(8, 1, 80000) batch mixing loud speech-band tones, noise, and
    near-silence (amplitude down to 1e-4) so quiet log-mel bins are
    exercised."""
    rng = np.random.default_rng(17)
    sr, n = 16000, 80000
    t = np.arange(n) / sr
    waves = []
    for i in range(8):
        amp = 10.0 ** (-i / 2.0)  # 1.0 .. 3e-4
        tone = np.sin(2 * np.pi * (120 + 40 * i) * t)
        tone += 0.5 * np.sin(2 * np.pi * (700 + 90 * i) * t)
        noise = rng.normal(scale=0.3, size=n)
        # gate: alternating voiced/near-silent 0.5 s segments
        gate = (np.floor(t * 2) % 2 == (i % 2)).astype(np.float64)
        w = amp * gate * (tone + noise) + 1e-5 * rng.normal(size=n)
        waves.append(w.astype(np.float32))
    return np.stack(waves)[:, None, :]


def _embed(registry_name, policy, wave, weights):
    from diart_tpu import precision
    from diart_tpu.models import EmbeddingModel

    model = EmbeddingModel.from_registry(registry_name, dtype="bf16")
    with precision.use(policy):
        out = model(wave, weights)
    return np.asarray(out, dtype=np.float64)


def _cosine(a, b):
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / den


def main():
    from diart_tpu.precision import Precision

    wave = _probe_waves()
    rng = np.random.default_rng(11)
    weights = (1.0 / (1.0 + np.exp(-rng.normal(size=(8, 293))))).astype(
        np.float32
    )
    only = sys.argv[1:] or sorted(FAMILIES)
    for family in only:
        name = FAMILIES[family]
        oracle = _embed(name, Precision.portable(), wave, weights)
        serving = _embed(name, Precision(), wave, weights)
        fast = _embed(
            name,
            dataclasses.replace(Precision(), fast_fbank=True),
            wave,
            weights,
        )
        print(
            json.dumps(
                {
                    "family": family,
                    "cos_serving_vs_f32_min": round(
                        float(_cosine(serving, oracle).min()), 6
                    ),
                    "cos_fast_vs_f32_min": round(
                        float(_cosine(fast, oracle).min()), 6
                    ),
                    "cos_fast_vs_serving_min": round(
                        float(_cosine(fast, serving).min()), 6
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
