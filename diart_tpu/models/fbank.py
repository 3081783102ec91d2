"""Log-mel filterbank frontend, as a pure jittable function.

Feature extractors for the mel-consuming embedding families (the reference
wraps speechbrain / wespeaker / NeMo models that consume 80-dim fbanks,
``README.md:172-178`` model table).

TPU formulation: framing + windowing + DFT run as ONE strided convolution
on the MXU — the DFT basis (with the window and any per-frame *linear* ops
like Kaldi's DC-removal/pre-emphasis folded in) is a trace-time constant
filterbank, exactly like the SincConv. This replaces the original
strided-gather + ``jnp.fft.rfft`` formulation, which was measured 2-4x
slower at serving shape on v5e (the gather walks the scalar core, and a
400-point FFT takes XLA's Bluestein path) and *less accurate*: TPU rfft is
~0.03 dB off a float64 oracle where the f32 ``precision=HIGHEST`` DFT
convolution is ~4e-5 dB (see PERF.md).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "log_mel_filterbank",
    "mel_filter_matrix",
    "num_fbank_frames",
    "speechbrain_log_mel",
    "speechbrain_mel_matrix",
    "kaldi_log_mel",
    "kaldi_mel_matrix",
    "nemo_log_mel",
    "librosa_mel_matrix",
]


# Test/benchmark hook: when set, forces the DFT/mel contraction precision
# regardless of the active policy (scripts/fbank_precision_bench.py).
_DFT_PRECISION_OVERRIDE = None


def _dft_precision():
    """Matmul precision for the DFT convolution and mel contraction.

    ``HIGH`` (3-pass bf16) while the ``fast_fbank`` policy switch is on
    (the default since round 3: −0.8 to −1.3 ms/step on every mel family
    at batch 256, embedding cosine vs the HIGHEST path ≥ 0.999995 —
    PERF.md "fast_fbank", PRECISION.md); otherwise ``HIGHEST`` (6-pass
    bf16, exact-grade: ~4e-5 dB off a float64 oracle). Consulted at trace
    time, like every other precision switch.
    """
    if _DFT_PRECISION_OVERRIDE is not None:
        return _DFT_PRECISION_OVERRIDE
    from .. import precision as _precision

    if _precision.enabled("fast_fbank"):
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


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


def _dft_power(signal: jnp.ndarray, basis: np.ndarray, hop: int) -> jnp.ndarray:
    """Power spectrum of hopped frames via a strided DFT convolution.

    signal: (batch, samples), already padded so that frame ``t`` starts at
    sample ``t * hop`` and the last frame fits. basis: (2 * bins, taps)
    numpy constant — ``bins`` cosine rows then ``bins`` sine rows, window
    (and any per-frame linear preprocessing) folded in. Returns
    (batch, frames, bins) float32.

    ``precision=HIGHEST`` keeps the f32 contraction exact-grade: measured
    ~4e-5 dB off a float64 oracle (the TPU rfft this replaces was ~0.03 dB)
    at about half the rfft path's runtime.
    """
    bins = basis.shape[0] // 2
    taps = basis.shape[1]
    batch, samples = signal.shape
    num_frames = (samples - taps) // hop + 1
    # Phase decomposition (same trick as the SincNet conv,
    # ``sincnet.py``): the waveform viewed as ``hop`` interleaved channels
    # turns the degenerate 1-channel stride-``hop`` convolution into a
    # stride-1, ``hop``-input-channel one — identical contraction, but the
    # emitter tiles a 160-channel operand onto the MXU where the 1-channel
    # layout ran at ~19 TFLOP/s (XProf, v5e; ~2x faster in-engine). The
    # basis is zero-padded to a whole number of hop-phases, and the signal
    # to cover the extra (zero-weighted) taps of the last frame — exact.
    k = -(-taps // hop)  # frame span in hops, ceil
    hops_needed = num_frames + k - 1
    needed = hops_needed * hop  # trailing remainder beyond the last frame's
    x = signal[:, :needed]  # zero-weighted taps is dropped / zero-padded
    x = jnp.pad(x, ((0, 0), (0, max(0, needed - samples))))
    x = x.reshape(batch, hops_needed, hop)  # frame t = hops [t, t+k)
    w = np.pad(basis, ((0, 0), (0, k * hop - taps))).reshape(-1, k, hop)
    y = jax.lax.conv_general_dilated(
        jnp.swapaxes(x, 1, 2),
        jnp.asarray(np.swapaxes(w, 1, 2)),
        (1,),
        "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=_dft_precision(),
    )  # (batch, 2 * bins, frames)
    power = y[:, :bins] ** 2 + y[:, bins:] ** 2
    return jnp.swapaxes(power, 1, 2)


def _dft_rows(dft_size: int, taps: np.ndarray, bins: int, offset: int = 0):
    """(cos, sin) DFT basis rows: ``basis[k, m] = cis(-2pi k (offset+m) /
    dft_size)`` sampled at tap positions ``m`` — float64 for synthesis."""
    k = np.arange(bins)[:, None].astype(np.float64)
    n = (offset + np.arange(len(taps)))[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / dft_size
    return np.cos(ang) * taps[None, :], np.sin(ang) * taps[None, :]


@lru_cache(maxsize=None)
def _hann_basis(n_fft: int) -> np.ndarray:
    cos_r, sin_r = _dft_rows(n_fft, np.hanning(n_fft), n_fft // 2 + 1)
    return np.concatenate([cos_r, sin_r], 0).astype(np.float32)


def log_mel_filterbank(
    waveform: jnp.ndarray,
    num_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """(batch, samples) -> (batch, frames, num_mels) log-mel energies."""
    power = _dft_power(waveform, _hann_basis(n_fft), hop)
    mel = jnp.einsum(
        "btf,mf->btm",
        power,
        jnp.asarray(mel_filter_matrix(num_mels, n_fft, sample_rate)),
        precision=_dft_precision(),
    )
    return jnp.log(mel + eps)


@lru_cache(maxsize=None)
def speechbrain_mel_matrix(
    num_mels: int = 80,
    n_fft: int = 400,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float = 8000.0,
) -> np.ndarray:
    """Triangular mel filterbank in speechbrain's convention
    (``speechbrain.processing.features.Filterbank``): smooth triangles on the
    linear frequency grid, both slopes normalized by the *left* bandwidth,
    peak amplitude 1. (num_mels, n_fft // 2 + 1)."""
    all_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), num_mels + 2)
    hz = _mel_to_hz(mel)
    band = (hz[1:] - hz[:-1])[:-1]  # left bandwidth per filter
    f_central = hz[1:-1]
    slope = (all_freqs[None, :] - f_central[:, None]) / band[:, None]
    left_side = slope + 1.0
    right_side = -slope + 1.0
    return np.maximum(0.0, np.minimum(left_side, right_side)).astype(np.float32)


def speechbrain_log_mel(
    waveform: jnp.ndarray,
    num_mels: int = 80,
    n_fft: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    amin: float = 1e-10,
    top_db: float = 80.0,
) -> jnp.ndarray:
    """(batch, samples) -> (batch, frames, num_mels) log-mel fbanks in
    speechbrain's ``Fbank`` convention (the frontend of the speechbrain
    ECAPA/x-vector recipes): centered STFT with constant padding and a
    periodic Hamming window, power spectrum, speechbrain mel triangles, and
    torchaudio-style amplitude_to_DB (10*log10, per-utterance top_db floor).
    """
    batch, samples = waveform.shape
    pad = n_fft // 2
    padded = jnp.pad(waveform, ((0, 0), (pad, pad)))
    num_frames = samples // hop + 1
    need = (num_frames - 1) * hop + n_fft
    power = _dft_power(padded[:, :need], _hamming_basis(n_fft), hop)
    fbanks = jnp.einsum(
        "btf,mf->btm",
        power,
        jnp.asarray(speechbrain_mel_matrix(num_mels, n_fft, sample_rate, f_min, f_max)),
        precision=_dft_precision(),
    )
    x_db = 10.0 * jnp.log10(jnp.maximum(fbanks, amin))
    floor = jnp.max(x_db, axis=(1, 2), keepdims=True) - top_db
    return jnp.maximum(x_db, floor)


@lru_cache(maxsize=None)
def _hamming_basis(n_fft: int) -> np.ndarray:
    # torch.hamming_window(periodic=True)
    n = np.arange(n_fft)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * n / n_fft)
    cos_r, sin_r = _dft_rows(n_fft, window, n_fft // 2 + 1)
    return np.concatenate([cos_r, sin_r], 0).astype(np.float32)


@lru_cache(maxsize=None)
def librosa_mel_matrix(
    num_mels: int = 80,
    n_fft: int = 512,
    sample_rate: int = 16000,
    f_min: float = 0.0,
    f_max: float = None,
) -> np.ndarray:
    """Mel filterbank in librosa's default convention (``librosa.filters.mel``
    with ``htk=False, norm='slaney'``), which NeMo's
    ``AudioToMelSpectrogramPreprocessor`` uses: the *Slaney* mel scale
    (linear below 1 kHz, log above) and Slaney area normalization
    (each triangle scaled by ``2 / (f[m+2] - f[m])``).
    (num_mels, n_fft // 2 + 1)."""
    f_max = f_max or sample_rate / 2

    def to_mel(hz):
        hz = np.asarray(hz, np.float64)
        mel = hz * 3.0 / 200.0
        log_step = np.log(6.4) / 27.0
        safe = np.maximum(hz, 1e-10)  # both where-branches evaluate
        return np.where(hz >= 1000.0, 15.0 + np.log(safe / 1000.0) / log_step, mel)

    def to_hz(mel):
        mel = np.asarray(mel, np.float64)
        hz = mel * 200.0 / 3.0
        log_step = np.log(6.4) / 27.0
        return np.where(mel >= 15.0, 1000.0 * np.exp(log_step * (mel - 15.0)), hz)

    mel_points = np.linspace(to_mel(f_min), to_mel(f_max), num_mels + 2)
    hz = to_hz(mel_points)
    fft_freqs = np.arange(n_fft // 2 + 1) * sample_rate / n_fft
    lower = (fft_freqs[None, :] - hz[:-2, None]) / (hz[1:-1] - hz[:-2])[:, None]
    upper = (hz[2:, None] - fft_freqs[None, :]) / (hz[2:] - hz[1:-1])[:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz[2:] - hz[:-2])
    return (weights * enorm[:, None]).astype(np.float32)


def nemo_log_mel(
    waveform: jnp.ndarray,
    num_mels: int = 80,
    n_fft: int = 512,
    win_length: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
    preemph: float = 0.97,
    log_guard: float = 2.0 ** -24,
) -> jnp.ndarray:
    """(batch, samples) -> (batch, frames, num_mels) log-mel features in
    NeMo's ``AudioToMelSpectrogramPreprocessor`` convention (the frontend of
    the TitaNet recipes): whole-signal pre-emphasis (first sample kept),
    centered reflect-padded STFT with a *symmetric* Hann(win_length) window
    zero-padded into ``n_fft``, power spectrum, librosa slaney-normalized mel
    triangles, and ``log(x + 2^-24)``. Per-feature normalization is the
    caller's job (it depends on the valid sequence length).
    """
    if preemph:
        waveform = jnp.concatenate(
            [waveform[:, :1], waveform[:, 1:] - preemph * waveform[:, :-1]], axis=1
        )
    batch, samples = waveform.shape
    pad = n_fft // 2
    padded = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = samples // hop + 1
    # the Hann(win_length) window is zero outside its centered span, so the
    # DFT convolution only needs win_length taps, phase-offset by the left
    # margin — the conv input starts `left` samples in
    left = (n_fft - win_length) // 2
    need = (num_frames - 1) * hop + win_length
    power = _dft_power(
        padded[:, left : left + need], _nemo_basis(n_fft, win_length), hop
    )
    mel = jnp.einsum(
        "btf,mf->btm",
        power,
        jnp.asarray(librosa_mel_matrix(num_mels, n_fft, sample_rate)),
        precision=_dft_precision(),
    )
    return jnp.log(mel + log_guard)


@lru_cache(maxsize=None)
def _nemo_basis(n_fft: int, win_length: int) -> np.ndarray:
    # torch.hann_window(win_length, periodic=False), centered into n_fft
    n = np.arange(win_length)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win_length - 1))
    left = (n_fft - win_length) // 2
    cos_r, sin_r = _dft_rows(n_fft, hann, n_fft // 2 + 1, offset=left)
    return np.concatenate([cos_r, sin_r], 0).astype(np.float32)


@lru_cache(maxsize=None)
def kaldi_mel_matrix(
    num_mels: int = 80,
    padded_window: int = 512,
    sample_rate: int = 16000,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi-convention mel filterbank (as in torchaudio.compliance.kaldi):
    triangles in *mel* space over the first ``padded_window // 2`` FFT bins
    (nyquist excluded). (num_mels, padded_window // 2)."""

    def to_mel(hz):
        return 1127.0 * np.log(1.0 + np.asarray(hz) / 700.0)

    nyquist = sample_rate / 2
    high = high_freq if high_freq > 0 else nyquist + high_freq
    num_bins = padded_window // 2
    fft_freqs = np.arange(num_bins) * sample_rate / padded_window
    mel_freqs = to_mel(fft_freqs)
    mel_low, mel_high = to_mel(low_freq), to_mel(high)
    delta = (mel_high - mel_low) / (num_mels + 1)
    filters = np.zeros((num_mels, num_bins), np.float32)
    for i in range(num_mels):
        left = mel_low + i * delta
        center = left + delta
        right = center + delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        filters[i] = np.clip(np.minimum(up, down), 0.0, None)
    return filters


def kaldi_log_mel(
    waveform: jnp.ndarray,
    num_mels: int = 80,
    frame_length: int = 400,
    hop: int = 160,
    sample_rate: int = 16000,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
) -> jnp.ndarray:
    """(batch, samples) -> (batch, frames, num_mels) log-mel fbanks in Kaldi
    conventions (torchaudio.compliance.kaldi.fbank with dither=0): snip-edges
    framing, per-frame DC removal, pre-emphasis, povey window, power
    spectrum on a pow2-padded FFT, mel triangles in mel space, natural log
    with the float32-epsilon floor. The WeSpeaker recipes consume exactly
    these features (followed by per-utterance mean normalization).
    """
    batch, samples = waveform.shape
    padded = 1 << (frame_length - 1).bit_length()  # next pow2 DFT size
    # per-frame DC removal, pre-emphasis and the povey window are all LINEAR
    # maps of the frame, so they live inside the DFT basis (float64 fold)
    basis = _kaldi_basis(frame_length, padded, preemphasis, remove_dc)
    power = _dft_power(waveform, basis, hop)
    mel = jnp.einsum(
        "btf,mf->btm",
        power,
        jnp.asarray(kaldi_mel_matrix(num_mels, padded, sample_rate)),
        precision=_dft_precision(),
    )
    return jnp.log(jnp.maximum(mel, np.finfo(np.float32).eps))


@lru_cache(maxsize=None)
def _kaldi_basis(
    frame_length: int, padded: int, preemphasis: float, remove_dc: bool
) -> np.ndarray:
    flen = frame_length
    linear = np.eye(flen)
    if remove_dc:
        linear = linear - np.full((flen, flen), 1.0 / flen)
    if preemphasis:
        pre = np.eye(flen) * 1.0
        pre[0, 0] = 1.0 - preemphasis
        for i in range(1, flen):
            pre[i, i - 1] = -preemphasis
        linear = pre @ linear
    n = np.arange(flen)
    povey = (0.5 - 0.5 * np.cos(2 * np.pi * n / (flen - 1))) ** 0.85
    linear = povey[:, None] * linear
    cos_r, sin_r = _dft_rows(padded, np.ones(flen), padded // 2)
    return np.concatenate([cos_r @ linear, sin_r @ linear], 0).astype(np.float32)


# --------------------------------------------------------------------- #
# Incremental (streaming-cached) mel frontends — engine ``fbank_ring``
# --------------------------------------------------------------------- #
# Every log-mel stage up to the window-level normalization is local to a
# frame: the DFT convolution and mel contraction are linear in the
# waveform, the power/log nonlinearities are per-frame, and the frame grid
# shifts by a whole number of frames per 0.5 s hop. So the RAW per-frame
# features (pre-normalization, pre-dB-floor) of the 4.5 s of unchanged
# samples can live in a device ring across hops — only the frames of the
# incoming block (plus the few window-EDGE frames whose padding depends on
# where the window starts/ends) are recomputed each step. The
# window-dependent finalization (speechbrain's top_db floor, CMN, NeMo's
# per-feature mean/std) runs on the assembled (B, frames, mels) tensor —
# tiny next to the full-window DFT convolution it replaces.
#
# The cached stage per family ("kind"):
#   kaldi        — log(max(mel, eps));  snip-edges framing, NO edge frames
#   speechbrain  — 10*log10(max(mel, amin)), PRE top_db floor; zero-padded
#                  centered framing -> 2 edge frames each side
#   nemo         — log(mel + 2^-24); whole-signal pre-emphasis (interior
#                  frames use true neighbors — identical streaming or not),
#                  reflect-padded centered framing -> 2 edge frames each side
#
# A never-written ring slot must equal the frames of an all-zero signal
# (the direct path's zero-filled warm-up window), which is a non-zero
# constant for log features — ``fbank_ring_fill``.


class FbankRingSpec(NamedTuple):
    """Geometry of one mel frontend's incremental frame ring."""

    kind: str  # "kaldi" | "speechbrain" | "nemo"
    num_mels: int
    sample_rate: int
    hop: int
    win: int  # conv taps per frame (frame span in samples)
    pad: int  # centered-framing margin (win // 2), 0 for snip-edges
    preemph: float  # whole-signal pre-emphasis (nemo), else 0
    frames: int  # window frames T_w
    fpb: int  # ring frames ingested per block
    nb: int  # blocks per window
    trim: int  # chron ring frames dropped at read
    interior: int  # frames served from the ring
    edge: int  # left-edge frames recomputed at read (= right-edge count)
    tail_conv: int  # previous-block samples the block conv needs
    right_need: int  # newest raw samples the right-edge frames need
    head_len: int  # per-block stored window-start samples (0 if edge == 0)
    tail_len: int  # per-stream stored newest raw samples


_FBANK_KINDS = {
    # kind: (win, hop, pad, preemph)
    "kaldi": (400, 160, 0, 0.0),
    "speechbrain": (400, 160, 200, 0.0),
    "nemo": (400, 160, 200, 0.97),
}


def fbank_ring_spec(
    kind: str,
    num_mels: int,
    sample_rate: int,
    chunk_samples: int,
    step_samples: int,
) -> "FbankRingSpec | None":
    """Build the ring geometry, or None when the hop grid does not divide
    the step (the incremental decomposition then does not apply)."""
    if kind not in _FBANK_KINDS:
        return None
    win, hop, pad, preemph = _FBANK_KINDS[kind]
    if step_samples % hop or chunk_samples % step_samples:
        return None
    if win - hop > step_samples or chunk_samples <= win:
        return None
    frames = (
        chunk_samples // hop + 1 if pad else (chunk_samples - win) // hop + 1
    )
    fpb = step_samples // hop
    nb = chunk_samples // step_samples
    # global frame-start grid: A ≡ (-pad) (mod hop); block k ingests the
    # frames whose sample span completes inside block k
    anchor = (-pad) % hop
    base = -win  # exclusive lower bound of A, relative to the block start
    a_min = base + 1 + ((anchor - (base + 1)) % hop)
    tail_conv = -a_min
    edge = -(-pad // hop)  # frames that read the left/right padding
    e_r = (frames - 1) - (chunk_samples + pad - win) // hop if pad else 0
    assert e_r == edge, (e_r, edge)
    interior = frames - 2 * edge
    trim = (edge * hop - pad + tail_conv) // hop
    assert 0 <= trim and trim + interior <= nb * fpb
    right_need = (
        chunk_samples - ((frames - edge) * hop - pad) if edge else 0
    )
    head_len = ((edge - 1) * hop - pad + win) if edge else 0
    ctx = 1 if preemph else 0
    tail_len = max(tail_conv + ctx, right_need + ctx, 1)
    # The head/tail caches store single-block slices (``blocks[:, :head_len]``
    # / ``blocks[:, -tail_len:]`` in ``_fring_advance``); a geometry whose
    # edge context spans more than one step block (e.g. step=320 with
    # win=400 passes the win-hop<=step guard above but needs tail_len=400)
    # has no single-block decomposition — fall back to the direct path
    # instead of crashing at trace time with a slice/concat shape mismatch.
    if head_len > step_samples or tail_len > step_samples:
        return None
    # The preemph kinds reflect real samples into the padding:
    # fbank_edge_right's slice (xp[:, -2:-2-pad:-1]) needs xp width
    # >= pad + 1, and fbank_edge_left's (xp[:, 1:pad+1]) needs head_len
    # >= pad + 1. A geometry with edge frames but insufficient context
    # would silently truncate the reflection and surface as an opaque
    # trace-time shape mismatch — fall back to the direct path instead.
    if edge and preemph and (right_need < pad + 1 or head_len < pad + 1):
        return None
    return FbankRingSpec(
        kind=kind,
        num_mels=num_mels,
        sample_rate=sample_rate,
        hop=hop,
        win=win,
        pad=pad,
        preemph=preemph,
        frames=frames,
        fpb=fpb,
        nb=nb,
        trim=trim,
        interior=interior,
        edge=edge,
        tail_conv=tail_conv,
        right_need=right_need,
        head_len=head_len,
        tail_len=tail_len,
    )


def _preemph_first_kept(x: jnp.ndarray, coeff: float) -> jnp.ndarray:
    """NeMo whole-signal pre-emphasis: first sample kept as-is."""
    return jnp.concatenate([x[:, :1], x[:, 1:] - coeff * x[:, :-1]], axis=1)


def _fbank_raw_frames(spec: FbankRingSpec, x: jnp.ndarray) -> jnp.ndarray:
    """Cached-stage features of frames starting at x's sample 0 grid.

    x: (B, samples) — already pre-emphasized for nemo (true neighbors).
    Returns (B, (len - win)//hop + 1, num_mels).

    NOTE: the per-kind constants below (kaldi preemphasis 0.97 +
    remove_dc, nemo n_fft 512, each kind's log guard) mirror the DEFAULTS
    of the direct frontends (``kaldi_log_mel``/``speechbrain_log_mel``/
    ``nemo_log_mel``), which is exactly how the model modules call them.
    Any drift between the two paths fails the ring-vs-direct parity suite
    (tests/test_fbank_ring.py) loudly.
    """
    if spec.kind == "kaldi":
        padded = 1 << (spec.win - 1).bit_length()
        power = _dft_power(
            x, _kaldi_basis(spec.win, padded, 0.97, True), spec.hop
        )
        mel = jnp.einsum(
            "btf,mf->btm",
            power,
            jnp.asarray(
                kaldi_mel_matrix(spec.num_mels, padded, spec.sample_rate)
            ),
            precision=_dft_precision(),
        )
        return jnp.log(jnp.maximum(mel, np.finfo(np.float32).eps))
    if spec.kind == "speechbrain":
        power = _dft_power(x, _hamming_basis(spec.win), spec.hop)
        mel = jnp.einsum(
            "btf,mf->btm",
            power,
            jnp.asarray(
                speechbrain_mel_matrix(
                    spec.num_mels, spec.win, spec.sample_rate
                )
            ),
            precision=_dft_precision(),
        )
        return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    if spec.kind == "nemo":
        n_fft = 512
        power = _dft_power(x, _nemo_basis(n_fft, spec.win), spec.hop)
        mel = jnp.einsum(
            "btf,mf->btm",
            power,
            jnp.asarray(
                librosa_mel_matrix(spec.num_mels, n_fft, spec.sample_rate)
            ),
            precision=_dft_precision(),
        )
        return jnp.log(mel + 2.0 ** -24)
    raise ValueError(spec.kind)


def fbank_ring_fill(spec: FbankRingSpec) -> np.ndarray:
    """The cached-stage value of a frame of all-zero samples — what a
    never-written ring slot must hold so warm-up windows reproduce the
    direct path's zero-filled semantics exactly. (num_mels,) float32."""
    if spec.kind == "kaldi":
        return np.full(
            spec.num_mels, np.log(np.finfo(np.float32).eps), np.float32
        )
    if spec.kind == "speechbrain":
        return np.full(spec.num_mels, -100.0, np.float32)  # 10*log10(1e-10)
    if spec.kind == "nemo":
        return np.full(spec.num_mels, np.log(2.0 ** -24), np.float32)
    raise ValueError(spec.kind)


def fbank_block_raw(
    spec: FbankRingSpec, tail: jnp.ndarray, block: jnp.ndarray
) -> jnp.ndarray:
    """Cached-stage features of the ``fpb`` frames a new block completes.

    tail: (B, >= tail_conv [+1 for preemph]) raw samples preceding the
    block; block: (B, step_samples). -> (B, fpb, num_mels)."""
    ctx = 1 if spec.preemph else 0
    x = jnp.concatenate(
        [tail[:, tail.shape[1] - spec.tail_conv - ctx :], block], axis=1
    )
    if spec.preemph:
        x = _preemph_first_kept(x, spec.preemph)[:, 1:]
    return _fbank_raw_frames(spec, x)[:, : spec.fpb]


def fbank_edge_left(spec: FbankRingSpec, head: jnp.ndarray) -> jnp.ndarray:
    """The ``edge`` window-leading frames (they read the left padding).

    head: (B, head_len) raw samples from the window start.
    -> (B, edge, num_mels)."""
    assert spec.edge
    if spec.preemph:
        xp = _preemph_first_kept(head, spec.preemph)
        lead = xp[:, 1 : spec.pad + 1][:, ::-1]  # reflect (no edge repeat)
    else:
        xp = head
        lead = jnp.zeros((head.shape[0], spec.pad), head.dtype)
    x = jnp.concatenate([lead, xp], axis=1)
    return _fbank_raw_frames(spec, x)[:, : spec.edge]


def fbank_edge_right(spec: FbankRingSpec, tail: jnp.ndarray) -> jnp.ndarray:
    """The ``edge`` window-trailing frames (they read the right padding).

    tail: (B, >= right_need [+1 for preemph]) newest raw samples.
    -> (B, edge, num_mels)."""
    assert spec.edge
    ctx = 1 if spec.preemph else 0
    t = tail[:, tail.shape[1] - spec.right_need - ctx :]
    if spec.preemph:
        xp = _preemph_first_kept(t, spec.preemph)[:, 1:]
        trail = xp[:, -2 : -2 - spec.pad : -1]  # reflect at the signal end
    else:
        xp = t
        trail = jnp.zeros((t.shape[0], spec.pad), t.dtype)
    x = jnp.concatenate([xp, trail], axis=1)
    return _fbank_raw_frames(spec, x)[:, : spec.edge]
