"""Log-mel filterbank frontend, as a pure jittable function.

Feature extractor for the ECAPA-TDNN embedding family (the reference wraps
speechbrain models that consume 80-dim fbanks, ``README.md:174-175`` model
table). Framing is expressed as a strided gather + one rFFT so XLA fuses the
window/power/mel chain; the mel matrix is a trace-time constant.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

__all__ = ["log_mel_filterbank", "mel_filter_matrix", "num_fbank_frames"]


def _hz_to_mel(hz):
    return 2595.0 * np.log10(1.0 + np.asarray(hz) / 700.0)


def _mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel) / 2595.0) - 1.0)


@lru_cache(maxsize=None)
def mel_filter_matrix(
    num_mels: int = 80,
    n_fft: int = 400,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float = None,
) -> np.ndarray:
    """Triangular mel filterbank, (num_mels, n_fft // 2 + 1)."""
    f_max = f_max or sample_rate / 2
    mel_points = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), num_mels + 2)
    hz_points = _mel_to_hz(mel_points)
    bins = np.floor((n_fft + 1) * hz_points / sample_rate).astype(int)
    filters = np.zeros((num_mels, n_fft // 2 + 1), np.float32)
    for m in range(1, num_mels + 1):
        left, center, right = bins[m - 1], bins[m], bins[m + 1]
        for k in range(left, center):
            if center > left:
                filters[m - 1, k] = (k - left) / (center - left)
        for k in range(center, right):
            if right > center:
                filters[m - 1, k] = (right - k) / (right - center)
    return filters


def num_fbank_frames(num_samples: int, n_fft: int = 400, hop: int = 160) -> int:
    return (num_samples - n_fft) // hop + 1


def log_mel_filterbank(
    waveform: jnp.ndarray,
    num_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """(batch, samples) -> (batch, frames, num_mels) log-mel energies."""
    batch, samples = waveform.shape
    num_frames = num_fbank_frames(samples, n_fft, hop)
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = waveform[:, idx]  # (batch, frames, n_fft)
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec) ** 2
    mel = jnp.einsum(
        "btf,mf->btm",
        power.astype(jnp.float32),
        jnp.asarray(mel_filter_matrix(num_mels, n_fft, sample_rate)),
    )
    return jnp.log(mel + eps)
