"""Multi-stream tuning throughput on the chip: trials/hour, one executable.

The reference distributes hyper-parameter search across processes/machines
coordinating through an RDB study, each worker paying a full per-file
Benchmark per trial (``/root/reference/src/diart/optim.py:98-122``,
README.md:246-273). The rebuild's answer: ``Optimizer(multi_stream=True)``
runs all corpus files as the stream-batch of ONE fused engine whose
hyper-parameters (tau/rho/delta/gamma/beta) are *dynamic inputs* of the
compiled step — every trial reuses the same executable, so a trial costs
device steps only.

This script measures that claim on the chip at production model shapes:

* ``shared`` mode: N trials through one Optimizer; reports total wall,
  trials/hour, and the engine's executable count (must be 1);
* ``per_trial`` mode: the naive baseline — the engine cache is dropped
  after every trial, so each trial rebuilds + retraces the engine (the
  persistent compilation cache makes the recompile a cache LOAD, i.e.
  this still *understates* the naive cost on a cold service).

Synthetic corpus (tone speakers + known RTTM truth) — DER values are
meaningless with random-init weights; throughput mechanics are the
quantity under test. Run on the real TPU: ``python scripts/tune_bench.py``;
``--quick`` is the CPU smoke. Prints one JSON line per mode.
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SR = 16000


def _make_corpus(root: Path, n_files: int, total_s: float):
    from fakes import Turn, synth_audio, turns_to_annotation

    from diart_tpu.audio import write_wav
    from diart_tpu.core import write_rttm

    audio_dir, rttm_dir = root / "audio", root / "rttm"
    audio_dir.mkdir(parents=True, exist_ok=True)
    rttm_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    for i in range(n_files):
        turns, t = [], 0.0
        while t < total_s - 1.0:
            dur = float(rng.uniform(1.0, 3.0))
            turns.append(Turn(t, min(t + dur, total_s), int(rng.integers(0, 3))))
            t += dur + float(rng.uniform(0.2, 1.0))
        uri = f"meet{i}"
        write_wav(audio_dir / f"{uri}.wav", synth_audio(turns, total_s, seed=i), SR)
        write_rttm(turns_to_annotation(turns, uri), rttm_dir / f"{uri}.rttm")
    return audio_dir, rttm_dir


def _models(quick: bool):
    from diart_tpu.models import EmbeddingModel, SegmentationModel

    if quick:
        seg = SegmentationModel.from_registry(
            "tpu/pyannet", lstm_hidden=16, lstm_layers=1, linear_dims=(16,),
            init_samples=SR,
        )
        emb = EmbeddingModel.from_registry(
            "tpu/xvector", embedding_dim=32, init_samples=SR
        )
    else:
        from bench import _distinct_filterbanks

        seg = SegmentationModel.from_registry("tpu/pyannet", dtype="f32")
        emb = EmbeddingModel.from_registry("tpu/xvector", dtype="bf16")
        _distinct_filterbanks(emb)
    return seg, emb


def _run_mode(mode, args, audio_dir, rttm_dir, out_dir):
    from diart_tpu import SpeakerDiarization, SpeakerDiarizationConfig
    from diart_tpu.optim import Optimizer, Study, TPESampler

    seg, emb = _models(args.quick)
    config = SpeakerDiarizationConfig(
        segmentation=seg,
        embedding=emb,
        duration=1.0 if args.quick else 5.0,
        step=0.5,
        latency=0.5,
        tau_active=0.3,
        max_speakers=4 if args.quick else 20,
        sample_rate=SR,
    )
    study = Study(
        out_dir / f"{mode}.db", sampler=TPESampler(seed=7), direction="minimize"
    )
    optimizer = Optimizer(
        SpeakerDiarization,
        audio_dir,
        rttm_dir,
        study,
        base_config=config,
        multi_stream=True,
    )
    optimizer.benchmark.show_progress = False

    trials = args.trials if mode == "shared" else max(3, args.trials // 4)
    if mode == "per_trial":
        # naive baseline: force a fresh engine (rebuild + retrace) per trial
        orig = optimizer._evaluate

        def evaluate_and_drop(params):
            optimizer.benchmark._engine_cache = None
            return orig(params)

        optimizer._evaluate = evaluate_and_drop

    # compile pass (not timed in either mode: both pay it once at service
    # start; the per-trial mode pays RE-traces inside the timed loop)
    optimizer(num_iter=1, show_progress=False)
    t0 = time.perf_counter()
    optimizer(num_iter=trials, show_progress=False)
    wall = time.perf_counter() - t0

    executables = None
    if optimizer.benchmark._engine_cache is not None:
        _, engine = optimizer.benchmark._engine_cache
        executables = int(engine._step._cache_size())
    print(
        json.dumps(
            {
                "mode": mode,
                "trials": trials,
                "files": args.files,
                "file_seconds": args.file_seconds,
                "wall_s": round(wall, 2),
                "s_per_trial": round(wall / trials, 2),
                "trials_per_hour": round(3600.0 * trials / wall, 1),
                "executables_per_engine": executables,
                "best_value": round(float(optimizer.best_performance), 2),
            }
        ),
        flush=True,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--files", type=int, default=32)
    p.add_argument("--file-seconds", type=float, default=30.0)
    p.add_argument("--modes", default="shared,per_trial")
    p.add_argument("--quick", action="store_true", help="tiny models / CPU smoke")
    args = p.parse_args()
    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.trials, args.files, args.file_seconds = 4, 4, 6.0
    else:
        import jax

        cache_dir = REPO / ".jax_cache"
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        audio_dir, rttm_dir = _make_corpus(root, args.files, args.file_seconds)
        for mode in args.modes.split(","):
            _run_mode(mode.strip(), args, audio_dir, rttm_dir, root)


if __name__ == "__main__":
    main()
