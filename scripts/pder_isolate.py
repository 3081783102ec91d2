"""Isolate the precision_der DER floor: which stage loses the accuracy —
the trained segmentation, the trained embedding + clustering, or the
engine plumbing? Cross-evaluates {fake, trained} x {fake, trained}."""

import sys
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))
sys.path.insert(0, str(_ROOT / "scripts"))

import importlib.util

spec = importlib.util.spec_from_file_location(
    "pder", _ROOT / "scripts" / "precision_der.py"
)
pder = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pder)

from fakes import (  # noqa: E402
    fake_embedding,
    fake_segmentation,
    synth_audio,
    turns_to_annotation,
)

from diart_tpu import precision  # noqa: E402
from diart_tpu.metrics import DiarizationErrorRate  # noqa: E402
from diart_tpu.parallel import MultiStreamEngine, MultiStreamSession  # noqa: E402
from diart_tpu.runtime.sinks import PredictionAccumulator  # noqa: E402


def run_eval(seg, emb, tau=0.5, delta=1.0):
    batch = len(pder.EVAL_TURNS)
    engine = MultiStreamEngine(
        segmentation=seg,
        embedding=emb,
        duration=pder.DURATION,
        step=pder.STEP,
        latency=pder.STEP,
        sample_rate=pder.SAMPLE_RATE,
        tau_active=tau,
        rho_update=0.1,
        delta_new=delta,
        max_speakers=8,
        batch_size=batch,
        precision=precision.Precision.portable(),
    )
    session = MultiStreamSession(engine, tau_active=tau, collect_audio=False)
    audios = [
        synth_audio(t, pder.TOTAL, seed=100 + i)
        for i, t in enumerate(pder.EVAL_TURNS)
    ]
    step_s = engine.step_samples
    accs = [PredictionAccumulator(f"s{i}") for i in range(batch)]
    for blk in range(int(pder.TOTAL * pder.SAMPLE_RATE) // step_s):
        blocks = np.stack(
            [a[0, blk * step_s : (blk + 1) * step_s] for a in audios]
        )
        for i, out in enumerate(session.push(blocks)):
            if out is not None:
                accs[i].on_next(out[0])
    ders = [
        DiarizationErrorRate()(
            turns_to_annotation(t, uri=f"s{i}"), accs[i].get_prediction()
        )
        for i, t in enumerate(pder.EVAL_TURNS)
    ]
    return float(np.mean(ders)), [round(d, 3) for d in ders]


def main():
    import jax

    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    seg_t = pder.train_segmentation(1200)
    emb_t_params = pder.train_embedding(600)

    from diart_tpu.models import EmbeddingModel

    emb_t = EmbeddingModel.from_registry(
        "tpu/xvector", embedding_dim=64, dtype="f32", init_samples=pder.CHUNK
    )
    emb_t.load()
    emb_t.params = emb_t_params

    for seg_name, seg in (("fake", fake_segmentation()), ("trained", seg_t)):
        for emb_name, emb in (("fake", fake_embedding()), ("trained", emb_t)):
            der, per = run_eval(seg, emb)
            print(
                f"seg={seg_name:8s} emb={emb_name:8s}: DER={der:.4f} per-stream={per}",
                flush=True,
            )


if __name__ == "__main__":
    main()
