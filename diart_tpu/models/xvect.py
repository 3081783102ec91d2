"""speechbrain fbank x-vector speaker embedding model, in JAX/flax.

Native equivalent of the ``speechbrain/spkrec-xvect-voxceleb`` row of the
reference's model table (``/root/reference/README.md:174``; loaded there
through pyannote's ``PretrainedSpeakerEmbedding``,
``/root/reference/src/diart/models.py:59``). Distinct from
:class:`diart_tpu.models.embedding.XVectorSincNet` (pyannote's
``pyannote/embedding``): this family runs the same TDNN stack over 24-mel
log-fbank features instead of a SincNet frontend, pads its convolutions
'same' with speechbrain's reflect mode instead of VALID, and pools with
speechbrain's ``StatisticsPooling`` conventions (unbiased std + 1e-5).

The compute graph follows ``speechbrain.lobes.models.Xvector.Xvector``
(verified against a faithful torch replica in ``tests/test_convert.py``):
Fbank(24) + per-utterance mean normalization, five Conv1d→LeakyReLU→BN
blocks with kernels (5,3,3,1,1) and dilations (1,2,3,1,1), statistics
pooling, and a linear projection to the embedding space — so real
speechbrain checkpoints convert weight-for-weight
(:func:`diart_tpu.models.convert.xvect_sb_params_from_state_dict`).

speechbrain's ``StatisticsPooling`` also adds a tiny positive perturbation
(eps·[1, 9] ≈ ≤9e-5) to the pooled mean — even at inference. It is random
and below every fidelity tolerance, so this implementation omits it; the
constant +1e-5 on the std half (which IS deterministic) is reproduced.

Trunk/head split as in :mod:`diart_tpu.models.embedding`: the TDNN trunk
runs once per chunk, the pooling head fans out per speaker with external
frame weights as reliability-weighted moments. The final 1x1 projection +
BN + moments reuse the fused Pallas head (:mod:`diart_tpu.ops.pallas_stats`)
when the ``pallas_head`` fast path is on — the geometry is identical to the
SincNet x-vector's.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import (
    InferenceBatchNorm,
    QuantizableConv,
    reflect_pad_time,
    resample_weights,
)
from .embedding import stats_from_moments, weighted_stats_pool
from .fbank import speechbrain_log_mel

__all__ = ["XVectorFbank"]


class XVectorFbank(nn.Module):
    """speechbrain x-vector: fbank frontend + TDNN stack + stats pooling.

    Defaults match the ``spkrec-xvect-voxceleb`` release (24 mels, 512-dim
    embeddings, channels (512, 512, 512, 512, 1500)).
    """

    embedding_dim: int = 512
    num_mels: int = 24
    sample_rate: int = 16000
    compute_dtype: jnp.dtype = jnp.float32
    tdnn_specs: Tuple[Tuple[int, int, int], ...] = (
        (5, 1, 512),
        (3, 2, 512),
        (3, 3, 512),
        (1, 1, 512),
        (1, 1, 1500),
    )
    std_eps: float = 1e-5  # speechbrain StatisticsPooling's +eps on std

    def setup(self):
        self.tdnns = [
            # 'same' padding happens via an explicit reflect pre-pad in
            # trunk_from_features; the conv itself is VALID
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

    def __call__(
        self, waveform: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        return self.head(self.trunk(waveform), weights)

    def _fused_head(self) -> bool:
        """Same gate as ``XVectorSincNet._fused_head``: the fused Pallas
        projection+moments kernel engages when the final TDNN really is a
        1x1, dilation-1 convolution (true for the standard geometry)."""
        from .. import precision

        last_kernel, last_dilation, _ = self.tdnn_specs[-1]
        return (
            last_kernel == 1
            and last_dilation == 1
            and precision.enabled("pallas_head")
            and not self.is_initializing()
        )

    def features(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames, num_mels) normalized fbanks
        (speechbrain Fbank(24) + per-utterance mean InputNormalization)."""
        feats = speechbrain_log_mel(
            waveform[:, 0, :], num_mels=self.num_mels, sample_rate=self.sample_rate
        )
        return feats - jnp.mean(feats, axis=1, keepdims=True)

    # incremental-frontend protocol (engine fbank_ring; models/fbank.py)
    fbank_ring_kind = "speechbrain"

    def finalize_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Window-dependent tail of ``features``: the top_db floor of
        ``speechbrain_log_mel`` plus the per-utterance mean norm. raw:
        the cached stage (pre-floor dB) assembled for the current window."""
        floor = jnp.max(raw, axis=(1, 2), keepdims=True) - 80.0
        x = jnp.maximum(raw, floor)
        return x - jnp.mean(x, axis=1, keepdims=True)

    def trunk_from_raw_fbank(self, raw: jnp.ndarray) -> jnp.ndarray:
        return self.trunk_from_features(self.finalize_fbank(raw))

    def trunk(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(batch, 1, samples) -> (batch, frames, channels)."""
        return self.trunk_from_features(self.features(waveform))

    def trunk_from_features(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(batch, frames, num_mels) -> (batch, frames, channels).

        With the fused Pallas head active the trunk stops before the final
        (1x1, 1500-channel) TDNN — that projection happens inside the head
        kernel, fused with the pooling contractions."""
        x = feats.astype(self.compute_dtype)
        stack = list(zip(self.tdnn_specs, self.tdnns, self.tdnn_norms))
        if self._fused_head():
            stack = stack[:-1]
        for (kernel, dilation, _), conv, norm in stack:
            x = conv(reflect_pad_time(x, (kernel - 1) * dilation // 2))
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = norm(x.astype(jnp.float32)).astype(self.compute_dtype)
        return x if self._fused_head() else x.astype(jnp.float32)

    def head(
        self, frames: jnp.ndarray, weights: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """frames: (batch, time, channels); weights: (batch, speakers,
        w_time) or None -> (batch, speakers, embedding_dim) (or (batch, dim)
        without weights).

        Weighted moments in pyannote ``StatsPool`` semantics (uniform
        weights reduce to speechbrain's unbiased std), plus speechbrain's
        deterministic +1e-5 on the std half."""
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
        mean, std = jnp.split(stats, 2, axis=-1)
        emb = self.embedding(jnp.concatenate([mean, std + self.std_eps], axis=-1))
        return emb[:, 0] if squeeze else emb
