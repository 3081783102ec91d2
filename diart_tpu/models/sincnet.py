"""SincNet learnable band-pass frontend, in JAX/flax.

TPU-native reimplementation of the SincNet trunk used by both pyannote
models the reference wraps (segmentation: PyanNet, embedding: XVectorSincNet
— loaded via ``/root/reference/src/diart/models.py:42-59``). Architecture
(matching pyannote.audio's SincNet block so checkpoints can be converted):

  wav instance-norm -> SincConv(80, k=251, stride=10) -> |.| -> maxpool(3)
  -> instance-norm -> leaky_relu
  -> Conv1d(60, k=5) -> maxpool(3) -> instance-norm -> leaky_relu
  -> Conv1d(60, k=5) -> maxpool(3) -> instance-norm -> leaky_relu

For a 5 s / 16 kHz chunk this yields (60, 293) — one frame every ~17 ms,
like the reference's segmentation grid (``blocks/diarization.py:190``).

TPU notes: the sinc filters are materialized from their (low, band) params at
trace time (cheap VPU work, fused by XLA); the convolution itself is a
strided ``lax.conv_general_dilated`` that XLA lowers onto the MXU. Inputs are
kept f32 (audio dynamic range), matmuls downstream run bf16.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SincConv", "SincNet", "num_sincnet_frames", "sinc_filters", "frontend_pool"]


def _mel_init(num_filters: int, sample_rate: int, min_low_hz: float, min_band_hz: float):
    """Mel-spaced initial (low, band) cutoffs, as in the original SincNet."""
    low_hz = 30.0
    high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)

    def to_mel(hz):
        return 2595 * np.log10(1 + hz / 700)

    def to_hz(mel):
        return 700 * (10 ** (mel / 2595) - 1)

    mel = np.linspace(to_mel(low_hz), to_mel(high_hz), num_filters + 1)
    hz = to_hz(mel)
    return hz[:-1].astype(np.float32), np.diff(hz).astype(np.float32)


class SincConv(nn.Module):
    """Conv1d whose kernels are parameterized band-pass sinc filters.

    Matches asteroid-filterbanks' ``ParamSincFB`` (the filterbank inside
    pyannote's SincNet, which the reference loads via pyannote.audio —
    ``/root/reference/src/diart/models.py:42-59``): ``num_filters // 2``
    learnable (low, band) cutoff pairs produce that many *cosine* (even,
    band-pass) filters and as many *sine* (odd) filters, concatenated
    [cos..., sin...] along the output-channel axis. Parameter shapes and the
    exact window/normalization conventions follow ParamSincFB so pretrained
    checkpoints convert bit-faithfully.
    """

    num_filters: int = 80
    kernel_size: int = 251
    stride: int = 10
    sample_rate: int = 16000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, phased: bool = False) -> jnp.ndarray:
        """x: (batch, 1, samples) -> (batch, num_filters, frames)

        ``phased``: ``x`` is already the phase-decomposed view
        ``(batch, stride, samples // stride)`` with sample ``s`` at
        ``[b, s % stride, s // stride]`` — the multi-stream engine stores
        its rolling audio window in this layout so the full-window
        relayout below (transpose + reshape of the whole 5 s waveform,
        ~0.46 ms/step at batch 256 on v5e) happens once per 0.5 s block
        instead of once per step. The convolution consumes identical
        values either way.
        """
        assert self.num_filters % 2 == 0, "num_filters must be even (cos+sin pairs)"
        assert self.kernel_size % 2 == 1, "kernel_size must be odd"
        cutoff = self.num_filters // 2
        init_low, init_band = _mel_init(
            cutoff, self.sample_rate, self.min_low_hz, self.min_band_hz
        )
        low_hz = self.param("low_hz", lambda _: jnp.asarray(init_low))
        band_hz = self.param("band_hz", lambda _: jnp.asarray(init_band))

        filters = sinc_filters(
            low_hz,
            band_hz,
            self.kernel_size,
            self.sample_rate,
            self.min_low_hz,
            self.min_band_hz,
        )

        if self.stride > 1:
            # Phase-decomposed formulation: view the waveform as `stride`
            # interleaved channels and the taps as (block, phase) pairs, so
            # the strided single-channel convolution becomes a stride-1
            # convolution with `stride` input channels — which the TPU conv
            # emitter tiles ~15% faster than the degenerate 1-channel form
            # (same contraction, identical results up to fp reassociation).
            #   y[t] = sum_tau x[s*t + tau] w[tau],  tau = s*j + r
            #        = sum_r sum_j x[s*(t+j) + r] w10[r, j]
            if phased:
                assert x.shape[1] == self.stride, (
                    f"phased input must be (B, stride={self.stride}, "
                    f"samples/stride); got {x.shape}"
                )
                samples = x.shape[1] * x.shape[2]
                xp = x
            else:
                assert x.shape[1] == 1, (
                    f"SincConv expects mono (B, 1, samples) input; got "
                    f"{x.shape[1]} channels (downmix before the frontend)"
                )
                samples = x.shape[-1]
                pad_s = (-samples) % self.stride
                xp = jnp.pad(x[:, 0, :], ((0, 0), (0, pad_s)))
                xp = jnp.transpose(
                    xp.reshape(x.shape[0], -1, self.stride), (0, 2, 1)
                )  # (B, stride, samples/stride)
            frames = (samples - self.kernel_size) // self.stride + 1
            blocks = -(-self.kernel_size // self.stride)  # ceil
            wp = jnp.pad(
                filters, ((0, 0), (0, blocks * self.stride - self.kernel_size))
            )
            # taps beyond kernel_size are zero, so frames near the end never
            # see the right padding of xp
            w10 = jnp.transpose(
                wp.reshape(self.num_filters, blocks, self.stride), (0, 2, 1)
            )  # (out, stride, blocks)
            y = jax.lax.conv_general_dilated(
                xp,
                w10,
                window_strides=(1,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
            )
            return y[..., :frames]

        return jax.lax.conv_general_dilated(
            x,
            filters[:, None, :],  # (out, in, kernel)
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )


def sinc_filters(
    low_hz: jnp.ndarray,
    band_hz: jnp.ndarray,
    kernel_size: int = 251,
    sample_rate: int = 16000,
    min_low_hz: float = 50.0,
    min_band_hz: float = 50.0,
) -> jnp.ndarray:
    """Materialize the ParamSincFB filterbank from its learnable cutoffs.

    low_hz / band_hz: (num_filters // 2,) -> (num_filters, kernel_size)
    with the cosine (even) filters first, then the sine (odd) filters —
    asteroid-filterbanks' exact synthesis (window sampling, 2*pi-carrying
    denominator, 1/(2*band) normalization), so converted pyannote
    checkpoints reproduce bit-faithful kernels.
    """
    low = min_low_hz + jnp.abs(low_hz)
    high = jnp.clip(
        low + min_band_hz + jnp.abs(band_hz), min_low_hz, sample_rate / 2
    )
    band = (high - low)[:, None]  # (cutoff, 1)

    # Left half of the filters (kernel_size odd). Original-SincNet
    # conventions (Ravanelli & Bengio): the Hamming window is sampled at
    # linspace(0, k/2 - 1, k//2) — NOT the first half of hamming(k) — and
    # the sinc denominator n_/2 carries the 2*pi factor. PARITY RISK
    # (unverifiable in this zero-egress environment): if
    # asteroid-filterbanks' ParamSincFB — the implementation pyannote
    # loads — samples its window differently (e.g. integer-n hamming with
    # a k-1 denominator), converted-checkpoint filters differ by ~1e-5
    # relative; the in-repo torch replica
    # (tests/torch_replicas.py) encodes THIS convention, so the
    # full-forward equivalence tests cannot arbitrate. Validate DER
    # against /root/reference/expected_outputs on first real-checkpoint
    # access (PARITY.md).
    half = kernel_size // 2
    n_lin = jnp.linspace(0.0, kernel_size / 2 - 1, half)
    window = (0.54 - 0.46 * jnp.cos(2 * jnp.pi * n_lin / kernel_size))[None, :]
    n_ = (
        2 * jnp.pi * jnp.arange(-((kernel_size - 1) / 2.0), 0.0) / sample_rate
    )[None, :]

    f_low = low[:, None] * n_
    f_high = high[:, None] * n_
    denom = n_ / 2
    cos_left = ((jnp.sin(f_high) - jnp.sin(f_low)) / denom) * window
    cos_filters = jnp.concatenate([cos_left, 2 * band, cos_left[:, ::-1]], axis=1)
    sin_left = ((jnp.cos(f_low) - jnp.cos(f_high)) / denom) * window
    sin_filters = jnp.concatenate(
        [sin_left, jnp.zeros_like(band), -sin_left[:, ::-1]], axis=1
    )
    return jnp.concatenate(
        [cos_filters / (2 * band), sin_filters / (2 * band)], axis=0
    )  # (num_filters, kernel)


def frontend_pool(y: jnp.ndarray) -> jnp.ndarray:
    """abs + non-overlapping max-pool(3) over time of the sinc-conv output
    (B, C, frames), with the TPU bf16 storage fast path applied to the
    pre-pool activation (see SincNet.__call__). Returns f32."""
    from .. import precision

    if precision.enabled("bf16_frontend"):
        y = y.astype(jnp.bfloat16)
    return _max_pool_time(jnp.abs(y), 3).astype(jnp.float32)


def _instance_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps=1e-5):
    """InstanceNorm1d(affine): normalize each (sample, channel) over time.
    x: (batch, channels, time)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * scale[None, :, None] + bias[None, :, None]


def _max_pool_time(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Non-overlapping max pool over the last axis. x: (B, C, T)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, window),
        window_strides=(1, 1, window),
        padding="VALID",
    )


class SincNet(nn.Module):
    """The full SincNet trunk (see module docstring).

    compute_dtype: activation dtype for the convolution stack. bf16 keeps
    the MXU on its fast path with f32 parameters/accumulation; the waveform
    instance-norm and sinc filter synthesis stay f32 (audio dynamic range).
    """

    stride: int = 10
    sample_rate: int = 16000
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        waveform: jnp.ndarray,
        pooled: Optional[jnp.ndarray] = None,
        phased: bool = False,
    ) -> jnp.ndarray:
        """waveform: (batch, 1, samples) -> (batch, 60, frames)

        ``pooled`` (batch, 80, pooled_frames): precomputed ``|sinc conv|``
        max-pooled activation (waveform-norm affine already folded in) —
        supplied by the multi-stream engine when it batches several models'
        filterbanks through ONE stacked convolution
        (:meth:`diart_tpu.parallel.engine.MultiStreamEngine`). When given,
        the wav-norm/conv/pool stage is skipped; parameters are still
        declared so the module's tree is identical either way.

        ``phased``: ``waveform`` is the phase-decomposed view
        ``(batch, stride, samples // stride)`` the engine's phase-major
        audio ring stores (see :class:`SincConv`). The waveform instance
        norm reduces over the same per-stream sample set either way.
        """
        scale0 = self.param("wav_norm_scale", nn.initializers.ones, (1,))
        bias0 = self.param("wav_norm_bias", nn.initializers.zeros, (1,))
        if pooled is None:
            if phased:
                mean = jnp.mean(waveform, axis=(1, 2), keepdims=True)
                var = jnp.var(waveform, axis=(1, 2), keepdims=True)
                x = (waveform - mean) * jax.lax.rsqrt(var + 1e-5)
                x = x * scale0[0] + bias0[0]
            else:
                x = _instance_norm(waveform, scale0, bias0)
            x = SincConv(
                stride=self.stride, sample_rate=self.sample_rate, name="sinc"
            )(x, phased=phased)
            # The pre-pool activation is the largest tensor of the whole
            # pipeline (~650 MB at batch 256) and purely HBM-bound: the TPU
            # conv emitter already multiplies in bf16, so storing the f32
            # ACCUMULATOR costs 2x the bytes for ~2^-9 relative precision
            # that the following instance-norm (computed in f32) re-absorbs.
            # Opt out with DIART_TPU_BF16_FRONTEND=0; CPU always stays f32.
            x = frontend_pool(x)
        else:
            # (init never passes `pooled`, so the SincConv parameters are
            # always created; at apply time they are simply not visited)
            x = pooled
        s = self.param("norm1_scale", nn.initializers.ones, (80,))
        b = self.param("norm1_bias", nn.initializers.zeros, (80,))
        x = nn.leaky_relu(_instance_norm(x, s, b), negative_slope=0.01)

        for i, channels in enumerate((60, 60)):
            x = nn.Conv(
                features=channels,
                kernel_size=(5,),
                padding="VALID",
                name=f"conv{i + 2}",
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
            )(jnp.swapaxes(x, 1, 2).astype(self.compute_dtype))
            x = x.astype(jnp.float32)
            x = jnp.swapaxes(x, 1, 2)
            x = _max_pool_time(x, 3)
            s = self.param(f"norm{i + 2}_scale", nn.initializers.ones, (channels,))
            b = self.param(f"norm{i + 2}_bias", nn.initializers.zeros, (channels,))
            x = nn.leaky_relu(_instance_norm(x, s, b), negative_slope=0.01)
        return x


def num_sincnet_frames(num_samples: int, kernel_size: int = 251, stride: int = 10) -> int:
    """Output frames of the SincNet trunk for a given chunk length.

    5 s @ 16 kHz -> 293 frames, matching the reference's observed grid
    (SURVEY.md §3.2; ``blocks/diarization.py:179-183``).
    """
    t = (num_samples - kernel_size) // stride + 1
    t //= 3  # pool
    t = (t - 5 + 1) // 3  # conv k5 + pool
    t = (t - 5 + 1) // 3  # conv k5 + pool
    return t
