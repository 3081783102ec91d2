"""On-device embedding fidelity of the int8 trunk fast path, per family.

For every natively-implemented embedding family this runs the SAME weighted
embedding extraction (waveform + frame weights -> embedding, the serving
path of ``parallel/engine.py:398-419``) under three numerics policies and
reports pairwise cosine similarity against the portable f32 oracle:

* ``f32``   — ``Precision.portable()``: every fast path off (the oracle);
* ``bf16``  — the flagship serving default (bf16 trunk storage/compute);
* ``int8``  — ``int8_trunk=True`` on top of the serving default
  (``ops/quant.py`` dynamic s8xs8->s32 convolutions).

Embeddings only feed cosine distances for clustering (reference:
``blocks/clustering.py:170-176``), so cosine-to-oracle is the fidelity
metric that matters; the clustering decision threshold delta_new operates
on cosine DISTANCES of order 0.1-1.0, so a cosine error of 1e-3 is two
orders below the decision scale.

Run on the real TPU (default platform); prints one JSON line per family.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FAMILIES = {
    "xvector": "tpu/xvector",
    "ecapa": "tpu/ecapa",
    "resnet34": "tpu/resnet34",
    "titanet": "tpu/titanet",
    "xvect-sb": "tpu/xvect-sb",
}


def _embed(registry_name, dtype, policy):
    """Fresh model instance per policy: __call__ jit-traces once, and the
    precision switches are consulted at trace time."""
    from diart_tpu import precision
    from diart_tpu.models import EmbeddingModel

    model = EmbeddingModel.from_registry(registry_name, dtype=dtype)
    rng = np.random.default_rng(11)
    wave = rng.normal(scale=0.1, size=(8, 1, 80000)).astype(np.float32)
    # soft per-frame weights in (0, 1), the OSP weights' range
    weights = (
        1.0 / (1.0 + np.exp(-rng.normal(size=(8, 293))))
    ).astype(np.float32)
    with precision.use(policy):
        out = model(wave, weights)
    return np.asarray(out, dtype=np.float64)


def _cosine(a, b):
    num = np.sum(a * b, axis=-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / den


def main():
    import dataclasses

    from diart_tpu.precision import Precision

    only = sys.argv[1:] or sorted(FAMILIES)
    for family in only:
        name = FAMILIES[family]
        oracle = _embed(name, "f32", Precision.portable())
        serving = _embed(name, "bf16", Precision())
        int8 = _embed(
            name, "bf16", dataclasses.replace(Precision(), int8_trunk=True)
        )
        cos_serving = _cosine(serving, oracle)
        cos_int8 = _cosine(int8, oracle)
        cos_int8_vs_serving = _cosine(int8, serving)
        print(
            json.dumps(
                {
                    "family": family,
                    "cos_bf16_vs_f32_min": round(float(cos_serving.min()), 6),
                    "cos_bf16_vs_f32_mean": round(float(cos_serving.mean()), 6),
                    "cos_int8_vs_f32_min": round(float(cos_int8.min()), 6),
                    "cos_int8_vs_f32_mean": round(float(cos_int8.mean()), 6),
                    "cos_int8_vs_bf16_min": round(
                        float(cos_int8_vs_serving.min()), 6
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
