"""Speaker embedding model with weighted statistics pooling, in JAX/flax.

Native equivalent of the ``pyannote/embedding`` x-vector family wrapped by
the reference (``/root/reference/src/diart/models.py:201-265``): SincNet
frontend, dilated TDNN stack, *weighted* statistics pooling (the paper's
Eq. 2 modification) and a linear projection to the embedding space.

TPU-first redesign — trunk/head split
-------------------------------------
The reference computes one embedding per (chunk, speaker) by repeating the
waveform per speaker and batching ``(batch*speakers)`` through the whole
model (``blocks/embedding.py:54-65``). But the per-speaker weights only
enter at the *pooling* stage, so the convolutional trunk is recomputed
``speakers`` times for identical input. Here the model is split:

* :meth:`trunk` — waveform -> (batch, frames, channels), run **once** per
  chunk;
* :meth:`head` — (frames, channels) + per-speaker weights
  (batch, speakers, frames) -> (batch, speakers, embedding_dim), a pair of
  einsum reductions.

For the default 20-speaker ceiling this removes ~95% of the embedding FLOPs
relative to a literal port, with bit-identical results.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import InferenceBatchNorm, QuantizableConv, resample_weights
from .sincnet import SincNet

__all__ = [
    "XVectorSincNet",
    "stats_from_moments",
    "weighted_stats_pool",
    "resample_weights",
]


# Note on a rejected optimization: a fused Pallas kernel computing both
# weighted moments in one pass (avoiding the frames**2 HBM materialization)
# was built and A/B-measured at batch 256 on v5e — it ran ~1 ms/step SLOWER
# than XLA's einsum formulation (~19.9 vs ~18.9 ms), because the conv
# output's layout copy dominates either way and the per-stream (4, T)x(T, C)
# matmuls serialize in the kernel while XLA batches them. The einsum path
# below is the measured-fastest formulation.


def weighted_stats_pool(
    frames: jnp.ndarray, weights: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Weighted temporal mean + std pooling, in pyannote ``StatsPool``
    semantics (reliability-weighted *unbiased* variance):

        mean = sum(w x) / (v1 + eps)
        var  = sum(w (x - mean)^2) / (v1 - v2/v1 + eps),   v1 = sum w,
                                                           v2 = sum w^2

    (with uniform weights this reduces to torch's default unbiased std).
    Pretrained pyannote embedding heads are trained on these statistics, so
    the convention matters for checkpoint fidelity.

    The per-speaker squared deviation is expanded algebraically
    (sum w x^2 - 2 mean sum w x + mean^2 v1) so no (batch, speakers, time,
    channels) intermediate is materialized — the TPU sees two einsum
    contractions per chunk regardless of speaker count.

    Parameters
    ----------
    frames: (batch, time, channels)
    weights: (batch, speakers, time) non-negative.

    Returns
    -------
    (batch, speakers, 2*channels) — concatenated weighted mean and std.
    """
    v1 = jnp.sum(weights, axis=-1)  # (B, S)
    v2 = jnp.sum(weights**2, axis=-1)
    s1 = jnp.einsum(
        "btc,bst->bsc", frames, weights, preferred_element_type=jnp.float32
    )
    s2 = jnp.einsum(
        "btc,bst->bsc", frames**2, weights, preferred_element_type=jnp.float32
    )
    return stats_from_moments(s1, s2, v1, v2, eps).astype(frames.dtype)


def stats_from_moments(
    s1: jnp.ndarray,
    s2: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Assemble the pooled ``[mean, std]`` vector from raw weighted moments
    (``s1/s2``: (B, S, C) sums of ``w*x`` / ``w*x**2``; ``v1/v2``: (B, S)
    sums of ``w`` / ``w**2``) — the shared tail of the einsum path above and
    the fused Pallas head (:mod:`diart_tpu.ops.pallas_stats`)."""
    mean = s1 / (v1 + eps)[..., None]
    sq_dev = s2 - 2 * mean * s1 + mean**2 * v1[..., None]
    denom = (v1 - v2 / jnp.maximum(v1, eps) + eps)[..., None]
    var = jnp.maximum(sq_dev / denom, 0.0)
    # sqrt with a finite gradient at var == 0 (reachable through the clamp;
    # sqrt'(0) = inf would NaN training) while keeping the forward exactly
    # sqrt(var), matching pyannote StatsPool
    positive = var > 0
    std = jnp.where(positive, jnp.sqrt(jnp.where(positive, var, 1.0)), 0.0)
    return jnp.concatenate([mean, std], axis=-1)


class XVectorSincNet(nn.Module):
    """SincNet + TDNN x-vector with weighted statistics pooling.

    TDNN geometry matches pyannote's XVectorSincNet:
    (kernel, dilation, channels) = (5,1,512), (3,2,512), (3,3,512),
    (1,1,512), (1,1,1500).
    """

    embedding_dim: int = 512
    sample_rate: int = 16000
    compute_dtype: jnp.dtype = jnp.float32
    tdnn_specs: Tuple[Tuple[int, int, int], ...] = (
        (5, 1, 512),
        (3, 2, 512),
        (3, 3, 512),
        (1, 1, 512),
        (1, 1, 1500),
    )

    def setup(self):
        self.sincnet = SincNet(
            sample_rate=self.sample_rate,
            compute_dtype=self.compute_dtype,
            name="sincnet",
        )
        self.tdnns = [
            # VALID padding (pyannote's convention); int8-able trunk matmuls
            # via the shared QuantizableConv (kernel/bias paths identical to
            # nn.Conv, so converters and the fused head are oblivious)
            QuantizableConv(
                features=channels,
                kernel_size=(kernel,),
                kernel_dilation=(dilation,),
                use_bias=True,
                name=f"tdnn{i}",
                compute_dtype=self.compute_dtype,
            )
            for i, (kernel, dilation, channels) in enumerate(self.tdnn_specs)
        ]
        self.tdnn_norms = [
            InferenceBatchNorm(channels, name=f"tdnn{i}_norm")
            for i, (_, _, channels) in enumerate(self.tdnn_specs)
        ]
        self.embedding = nn.Dense(self.embedding_dim, name="embedding")

    # the engine may feed the phase-decomposed waveform layout directly
    # (``phased=True``; see models/sincnet.py SincConv)
    supports_phased_wave = True

    def __call__(
        self, waveform: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        frames = self.trunk(waveform)
        return self.head(frames, weights)

    def _fused_head(self) -> bool:
        """Whether the final TDNN + weighted statistics run as one fused
        Pallas kernel (ops/pallas_stats.py) instead of materializing the
        (B, T, 1500) projection in HBM. ON by default on TPU
        (``DIART_TPU_PALLAS_HEAD=0`` opts out); during ``init`` the standard
        path runs so every parameter is created. The kernel treats the final
        TDNN as a pointwise projection, so it only engages when that layer
        really is a 1x1, dilation-1 convolution (true for the standard
        x-vector geometry; custom ``tdnn_specs`` fall back to the XLA
        path)."""
        from .. import precision

        last_kernel, last_dilation, _ = self.tdnn_specs[-1]
        return (
            last_kernel == 1
            and last_dilation == 1
            and precision.enabled("pallas_head")
            and not self.is_initializing()
        )

    def trunk(
        self,
        waveform: jnp.ndarray,
        sinc_pooled=None,
        phased: bool = False,
    ) -> jnp.ndarray:
        """waveform: (batch, 1, samples) -> (batch, frames, channels).

        With the fused Pallas head active the trunk stops before the final
        (1x1, 1500-channel) TDNN — that projection happens inside the head
        kernel, fused with the pooling contractions. ``sinc_pooled``:
        optional precomputed pooled sinc-conv activation (engine
        stacked-frontend path). ``phased``: waveform is the engine's
        phase-major ring layout (batch, stride, samples/stride) — see
        models/sincnet.py SincConv."""
        x = self.sincnet(waveform, pooled=sinc_pooled, phased=phased)
        x = jnp.swapaxes(x, 1, 2).astype(self.compute_dtype)  # (B, T, 60)
        stack = list(zip(self.tdnns, self.tdnn_norms))
        if self._fused_head():
            stack = stack[:-1]
        for conv, norm in stack:
            if x.shape[1] < 1:
                # shapes are static under jit, so this raises at trace time
                raise ValueError(
                    f"waveform too short for the x-vector receptive field: "
                    f"{waveform.shape[-1]} samples leave no frames after the "
                    f"dilated TDNN stack (zero-size frames would silently "
                    f"produce empty statistics and NaN gradients)"
                )
            x = conv(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = norm(x.astype(jnp.float32)).astype(self.compute_dtype)
        if x.shape[1] < 1:
            raise ValueError(
                f"waveform too short for the x-vector receptive field: "
                f"{waveform.shape[-1]} samples leave no frames after the "
                f"dilated TDNN stack"
            )
        # fused head: keep compute_dtype so the kernel streams half the bytes
        return x if self._fused_head() else x.astype(jnp.float32)

    def head(
        self, frames: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """frames: (batch, time, channels); weights: (batch, speakers, w_time)
        or None -> (batch, speakers, embedding_dim) (or (batch, dim) without
        weights).

        With the fused Pallas head, ``frames`` are the pre-projection trunk
        activations and the final TDNN + batch-norm + weighted moments run in
        one kernel (the (B, T, 1500) projection never reaches HBM)."""
        squeeze = weights is None
        if weights is None:
            weights = jnp.ones(frames.shape[:1] + (1, frames.shape[1]), frames.dtype)
        weights = resample_weights(weights, frames.shape[1])
        if self._fused_head():
            from ..ops.pallas_stats import fused_linear_stats

            proj = self.tdnns[-1].variables["params"]
            nrm = self.tdnn_norms[-1].variables["params"]
            a_eff = nrm["scale"] * jax.lax.rsqrt(nrm["var"] + 1e-5)
            c_eff = nrm["bias"] - nrm["mean"] * a_eff
            wf = weights.astype(jnp.float32)
            s1, s2 = fused_linear_stats(
                frames, proj["kernel"][0], proj["bias"], a_eff, c_eff, wf
            )
            stats = stats_from_moments(
                s1, s2, jnp.sum(wf, axis=-1), jnp.sum(wf**2, axis=-1)
            )
        else:
            stats = weighted_stats_pool(frames, weights)
        emb = self.embedding(stats)
        return emb[:, 0] if squeeze else emb
