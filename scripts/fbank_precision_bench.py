"""Measure the mel-fbank DFT convolution at the three matmul precisions.

The fbank frontends run their strided DFT convolution at
``Precision.HIGHEST`` (6-pass bf16, ~40 TF/s measured on v5e — exact-grade,
~4e-5 dB off a float64 oracle). ``HIGH`` (3-pass) and ``DEFAULT`` (1-pass)
trade accuracy for MXU rate. This script measures, per fbank family at the
serving shape (batch 256, 5 s):

* device time, via K=32 chained fbank applications inside ONE jitted call
  (the dev tunnel's ~28 ms RTT swamps single-call timing) with the input
  perturbed per iteration (the axon terminal caches identical
  (executable, input) runs, and XLA would hoist a loop-invariant body);
* feature error vs the HIGHEST features, in the family's own log units
  (dB for speechbrain's amplitude_to_DB, nats for kaldi/nemo): max-abs,
  p99.9, and max over energetic (within 60 dB of peak) bins — quiet bins
  are where 1-pass input rounding shows up first.

Two pjit-cache traps this script works around: a fresh closure per
precision level (jax.jit wrappers of the SAME function object share the
global pjit executable cache — three levels would silently reuse one
executable), and on-device input perturbation.

Decides what the ``fast_fbank`` precision switch should map to.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from diart_tpu.models import fbank  # noqa: E402

B, SECONDS, SR = 256, 5, 16000
N = SECONDS * SR
K = 32  # chained applications per timed call


def speechy_audio(rng, batch, samples):
    """Speech-like synthetic: harmonic stacks with moving f0 + formant
    envelope + noise floor ~40 dB down + leading silence."""
    t = np.arange(samples) / SR
    out = np.zeros((batch, samples), np.float32)
    for b in range(batch):
        f0 = rng.uniform(90, 240)
        drift = 1.0 + 0.08 * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) * t)
        sig = np.zeros(samples)
        for h in range(1, 24):
            amp = (1.0 / h) * (
                1.0 + 1.5 * np.exp(-((h * f0 - 700) ** 2) / 2e5)
                + 0.8 * np.exp(-((h * f0 - 1800) ** 2) / 8e5)
            )
            sig += amp * np.sin(2 * np.pi * h * f0 * np.cumsum(drift) / SR)
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t))
        sig *= env
        sig += 10 ** (-40 / 20) * rng.standard_normal(samples)
        sil = int(rng.uniform(0.1, 0.4) * SR)
        sig[:sil] *= 10 ** (-40 / 20)
        out[b] = 0.1 * sig / max(1e-9, np.abs(sig).std())
    return out


FAMILIES = {
    "speechbrain(dB)": fbank.speechbrain_log_mel,
    "kaldi(ln)": fbank.kaldi_log_mel,
    "nemo(ln)": fbank.nemo_log_mel,
}

LEVELS = {
    "HIGHEST": jax.lax.Precision.HIGHEST,
    "HIGH": jax.lax.Precision.HIGH,
    "DEFAULT": jax.lax.Precision.DEFAULT,
}


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(speechy_audio(rng, B, N))
    audio.block_until_ready()
    for fam_name, fam_fn in FAMILIES.items():
        ref = None
        for lev_name, lev in LEVELS.items():
            fbank._DFT_PRECISION_OVERRIDE = lev

            # fresh closures per level: jit wrappers of the same function
            # object share the global pjit executable cache
            def once(x, _fam=fam_fn):
                return _fam(x)

            def many(x, _fam=fam_fn):
                def body(i, acc):
                    xi = x * (1.0 + 1e-9 * i.astype(jnp.float32))
                    return acc + _fam(xi).sum()

                return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

            jit_once = jax.jit(once)
            jit_many = jax.jit(many)
            feats = np.asarray(jit_once(audio))
            jit_many(audio).block_until_ready()  # compile
            times = []
            for i in range(6):
                xi = (audio * (1.0 + 1e-9 * (i + 1))).block_until_ready()
                t0 = time.perf_counter()
                jit_many(xi).block_until_ready()
                times.append(time.perf_counter() - t0)
            t_iter = float(np.median(times[1:]) / K * 1e3)
            if lev_name == "HIGHEST":
                ref = feats
                print(
                    f"{fam_name:16s} {lev_name:8s} t={t_iter:6.2f} ms/call  (reference)",
                    flush=True,
                )
                continue
            err = np.abs(feats - ref)
            floor = ref.max() - (60.0 if "dB" in fam_name else 60.0 / 4.343)
            loud = ref > floor
            print(
                f"{fam_name:16s} {lev_name:8s} t={t_iter:6.2f} ms/call  "
                f"max={err.max():.3e} p99.9={np.quantile(err, 0.999):.3e} "
                f"max_loud={err[loud].max():.3e}",
                flush=True,
            )
        fbank._DFT_PRECISION_OVERRIDE = None


if __name__ == "__main__":
    main()
