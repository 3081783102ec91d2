"""Polyphase sample-rate conversion as a jittable convolution.

The reference delegates resampling to torchaudio
(``/root/reference/src/diart/blocks/utils.py:62-89``, ``audio.py:31``). This
is the same windowed-sinc polyphase algorithm expressed as a single strided
``lax.conv_general_dilated`` so it fuses into the device pipeline: the kernel
has one row per output phase (``new_freq`` rows after gcd reduction), and the
convolution with stride ``orig_freq`` produces all phases at once.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample", "resample_kernel"]


@lru_cache(maxsize=None)
def resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> Tuple[np.ndarray, int, int, int]:
    """Hann-windowed sinc interpolation kernel.

    Returns (kernel (new, 1, K), width, reduced orig, reduced new).
    """
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx[None, :]) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t)) * window
    kernel *= base_freq / orig
    return kernel.astype(np.float32)[:, None, :], width, orig, new


def resample(waveform: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample the last axis of ``waveform`` from ``orig_freq`` to ``new_freq``.

    Parameters
    ----------
    waveform: (..., samples)

    Returns
    -------
    (..., ceil(samples * new / orig))
    """
    if orig_freq == new_freq:
        return waveform
    kernel, width, orig, new = resample_kernel(orig_freq, new_freq)
    shape = waveform.shape
    length = shape[-1]
    x = waveform.reshape(-1, 1, length)
    x = jnp.pad(x, ((0, 0), (0, 0), (width, width + orig)))
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernel),
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (batch, new, frames)
    y = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], -1)
    target_length = int(math.ceil(new * length / orig))
    y = y[:, :target_length]
    return y.reshape(*shape[:-1], target_length)
