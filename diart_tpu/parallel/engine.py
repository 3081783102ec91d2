"""Fused multi-stream diarization engine — the TPU-native hot path.

This is the idiomatic redesign of the reference's per-chunk pipeline
(``/root/reference/src/diart/blocks/diarization.py:157-234``): instead of a
reactive host loop that crosses the device boundary twice per chunk per
stream, ONE jitted ``step`` advances N independent audio streams by one hop:

  audio ring update -> segmentation forward -> OSP weights -> embedding
  trunk (once) + per-speaker pooled heads -> embedding normalization ->
  masked online clustering (vmapped) -> score ring update -> Hamming
  overlap-add aggregation with static gather indices

Everything is fixed-shape, fully on device, and batched over streams; the
host only supplies 500 ms audio blocks and receives the latency-delayed
aggregated scores to binarize into RTTM. Streams are the batch dimension —
``vmap`` for one chip, ``jax.sharding`` over a mesh axis for many chips
(stream-level data parallelism over ICI; SURVEY.md §2 explains why TP/PP is
not warranted: model forwards are ms-scale).

State is donated to the jitted step, so rings update in place in HBM.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import precision as precision_policy
from ..models.base import EmbeddingModel, SegmentationModel
from ..models.fbank import (
    FbankRingSpec,
    fbank_block_raw,
    fbank_edge_left,
    fbank_edge_right,
    fbank_ring_fill,
    fbank_ring_spec,
)
from ..models.sincnet import frontend_pool, sinc_filters
from ..ops.aggregation import AggregationGeometry, aggregate, build_geometry
from ..ops.clustering import ClusteringParams, ClusteringState, cluster_step
from ..ops.functional import (
    min_max_normalize,
    normalize_embeddings,
    overlapped_speech_penalty,
)

__all__ = ["StreamState", "StepOutput", "MultiStreamEngine"]


def _sincnet_params(params):
    """Extract a model's SincNet frontend parameters (filterbank cutoffs +
    waveform-norm affine), or None if the model has no standard SincNet."""
    try:
        sn = params["params"]["sincnet"]
        return {
            "low": sn["sinc"]["low_hz"],
            "band": sn["sinc"]["band_hz"],
            "scale": sn["wav_norm_scale"],
            "bias": sn["wav_norm_bias"],
        }
    except (KeyError, TypeError):
        return None


def _sincnet_geometry(module):
    """A model's SincNet convolution hyper-parameters, for the fused
    dual-frontend paths: (stride, kernel_size, min_low_hz, min_band_hz,
    sample_rate). Every module this package builds (PyanNet, XVectorSincNet,
    converted checkpoints) constructs its SincNet with the SincNet/SincConv
    class defaults, which the fallbacks below read; a custom module with a
    different frontend geometry declares ``sinc_stride`` /
    ``sinc_kernel_size`` / ``sinc_min_low_hz`` / ``sinc_min_band_hz`` fields
    to inform the engine (the fused paths refuse to combine models whose
    geometries differ)."""
    from ..models.sincnet import SincConv, SincNet

    return (
        getattr(module, "sinc_stride", SincNet.stride),
        getattr(module, "sinc_kernel_size", SincConv.kernel_size),
        getattr(module, "sinc_min_low_hz", SincConv.min_low_hz),
        getattr(module, "sinc_min_band_hz", SincConv.min_band_hz),
        getattr(module, "sample_rate", 16000),
    )


class StreamState(NamedTuple):
    """Batched per-stream state (leading axis = streams)."""

    audio: jnp.ndarray  # (B, chunk_samples) rolling waveform window
    # (in fbank_ring mode this field instead holds the pytree {"window":
    # the waveform window above, "ring": the embedding frontend's rolling
    # chronological log-mel frames, "head": per-block window-start samples,
    # "tail": newest raw samples} — see MultiStreamEngine._audio_init)
    ring: jnp.ndarray  # (B, W, frames, M) permuted score ring, newest first
    centers: jnp.ndarray  # (B, M, E) centroid sums
    center_active: jnp.ndarray  # (B, M)
    initialized: jnp.ndarray  # (B,)
    chunk_count: jnp.ndarray  # (B,) chunks emitted so far


class StepOutput(NamedTuple):
    aggregated: jnp.ndarray  # (B, num_out, M) latency-delayed scores
    newest: jnp.ndarray  # (B, frames, M) permuted scores of the new chunk
    chunk_index: jnp.ndarray  # (B,) 0-based index of the chunk just emitted


class MultiStreamEngine:
    """Drives N concurrent streams through one compiled step.

    Parameters
    ----------
    segmentation / embedding: loaded model wrappers. ``embedding`` may be
        None for VAD-only operation (segmentation + aggregation, no
        clustering — the fused analogue of ``blocks/vad.py:76-191``).
    config values mirror ``SpeakerDiarizationConfig``
        (``blocks/diarization.py:21-86``).
    batch_size: number of concurrent streams (the TPU batch dimension).
    mesh: optional ``jax.sharding.Mesh`` with a ``"streams"`` axis; state and
        inputs are sharded along it (multi-chip scale-out over ICI).
    """

    def __init__(
        self,
        segmentation: SegmentationModel,
        embedding: Optional[EmbeddingModel] = None,
        duration: float = 5.0,
        step: float = 0.5,
        latency: Optional[float] = None,
        sample_rate: int = 16000,
        tau_active: float = 0.6,
        rho_update: float = 0.3,
        delta_new: float = 1.0,
        gamma: float = 3.0,
        beta: float = 10.0,
        max_speakers: int = 20,
        normalize_embedding_weights: bool = False,
        batch_size: int = 1,
        mesh: Optional[jax.sharding.Mesh] = None,
        precision: Optional[precision_policy.Precision] = None,
    ):
        self.duration = duration
        self.step_duration = step
        self.latency = step if latency in (None, "min") else (
            duration if latency == "max" else float(latency)
        )
        assert step <= self.latency <= duration, (
            f"latency must be within [{step}, {duration}]"
        )
        # Ring geometry and warm-up counting assume whole numbers of hops per
        # window; a non-integer ratio would silently mis-place the warm-up
        # boundary and the aggregation focus.
        for name, value in (("duration", duration), ("latency", self.latency)):
            ratio = value / step
            if abs(ratio - round(ratio)) > 1e-6:
                raise ValueError(
                    f"{name} ({value}) must be an integer multiple of step "
                    f"({step}); got ratio {ratio:.4f}"
                )
        self.sample_rate = sample_rate
        self.batch_size = batch_size
        self.max_speakers = max_speakers
        # Numerics/fast-path policy: explicit construction state (defaults =
        # the ambient policy, itself defaulting to the flagship serving
        # config). Every trace of the engine's programs runs inside
        # ``precision.use(self.precision)``; env vars remain overrides.
        self.precision = (
            precision if precision is not None else precision_policy.active()
        )
        self.normalize_weights = normalize_embedding_weights
        # Hyper-parameters are DYNAMIC inputs of the compiled step (they only
        # appear in elementwise comparisons), so tuning sweeps re-use one
        # executable instead of recompiling per trial.
        self.set_hyperparameters(
            tau_active=tau_active,
            rho_update=rho_update,
            delta_new=delta_new,
            gamma=gamma,
            beta=beta,
        )
        self.mesh = mesh

        self.chunk_samples = int(round(duration * sample_rate))
        self.step_samples = int(round(step * sample_rate))

        segmentation.load()
        if segmentation.params is None:
            raise RuntimeError(
                "MultiStreamEngine requires jittable models; host-only (ONNX) "
                "models run through the SpeakerDiarization / "
                "VoiceActivityDetection pipeline path instead"
            )
        self._seg_apply = segmentation.apply_fn()
        self._seg_params = segmentation.params
        self.is_vad = embedding is None
        if not self.is_vad:
            embedding.load()
            if embedding.params is None:
                raise RuntimeError(
                    "MultiStreamEngine requires jittable models; host-only "
                    "(ONNX) embedding models run through the "
                    "SpeakerDiarization pipeline path instead"
                )
            self._trunk = embedding.trunk_fn()
            self._head = embedding.head_fn()
            self._emb_params = embedding.params
            self.embedding_dim = embedding.embedding_dim
        else:
            self.embedding_dim = 1

        # Stacked frontend (OPT-IN, DIART_TPU_STACK_FRONTEND=1): when
        # segmentation and embedding carry DISTINCT SincNet filterbanks
        # (real pretrained checkpoints), fold each model's waveform-norm
        # affine into its filters and run ONE 160-channel convolution + pool
        # on the shared standardized waveform. The fold is exact
        # (conv(z*s + b*1) == s*conv(z) + b*sum(filters); parity-tested),
        # but A/B on v5e at batch 256 measured the stacked 160-channel conv
        # ~1.2 ms/step SLOWER than two separate 80-channel convolutions
        # (XLA's conv emitter tiles the 80-channel shape better), so the
        # default stays off. With IDENTICAL filterbanks (registry models)
        # XLA already CSEs the two convolutions and stacking would only
        # double the work, so the dispatch also checks parameter values.
        self._stacked = False
        if not self.is_vad:
            with precision_policy.use(self.precision):
                stack_on = precision_policy.enabled("stack_frontend")
            sp = _sincnet_params(self._seg_params)
            ep = _sincnet_params(self._emb_params)
            if sp is not None and ep is not None and stack_on:
                identical = all(
                    np.array_equal(np.asarray(sp[k]), np.asarray(ep[k]))
                    for k in sp
                )
                # The stacked convolution runs ONE geometry, so it only
                # engages when both frontends declare the same one (every
                # module this package builds does; ADVICE r1: a checkpoint
                # with a non-default stride/kernel must not silently run
                # under the default geometry).
                geo_seg = _sincnet_geometry(segmentation.module)
                geo_emb = _sincnet_geometry(embedding.module)
                self._stacked = not identical and geo_seg == geo_emb
                self._sinc_seg, self._sinc_emb = sp, ep
                self._sinc_geometry = geo_seg

        # Phase-major audio ring: when every model's frontend is a
        # stride-s SincNet (s > 1) that accepts the phase-decomposed
        # waveform layout directly (``supports_phased_wave``), the engine
        # stores its rolling window ALREADY as (B, s, samples/s) — sample
        # i at [b, i % s, i // s], exactly what the SincNet convolution
        # consumes. Otherwise each step relays out the full 5 s window
        # (a {1,0}->{0,1} copy + phase reshape, ~0.46 ms/step at batch 256
        # on v5e — XProf: copy.469 + reshape.354 in the r3 flagship trace);
        # phase-major, only the incoming 0.5 s block is reshaped. Pure
        # layout change — identical contraction, engaged on every backend.
        # Opt out (e.g. to A/B) with DIART_TPU_PHASED_RING=0 or a
        # ``phased_ring=False`` precision policy.
        # Incremental mel frontend (``fbank_ring``): every log-mel stage up
        # to the window-level normalization is frame-local (models/fbank.py
        # "Incremental mel frontends"), so the embedding's RAW per-frame
        # log-mel features of the 4.5 s of unchanged samples live in a
        # rolling device ring across hops — each step computes only the
        # incoming block's frames plus the window-EDGE frames (whose padding
        # depends on the window position), and the full-window DFT
        # convolution disappears from the step. The model's
        # ``finalize_fbank`` + ``trunk_from_raw_fbank`` consume the
        # assembled (B, frames, mels) tensor. The ring is CHRONOLOGICAL and
        # advances by a static slice+concat (pause/resume = masked select,
        # exactly like the waveform window) — every per-stream
        # dynamic-indexing formulation (vmapped dynamic_update_slice,
        # one-hot permutation dot, per-stream Pallas rotate) measured far
        # over roofline on v5e and was rejected (PERF.md "conv_ring",
        # scripts/convring_isolate.py). A SincNet conv-output ring was
        # likewise measured and rejected: at stride 10 / 80 channels the
        # ring holds 4x the raw window's bytes, so maintaining it costs
        # more than the convolution it caches. Opt out with
        # DIART_TPU_FBANK_RING=0 or a ``fbank_ring=False`` policy.
        self._fring: Optional[FbankRingSpec] = None
        with precision_policy.use(self.precision):
            fring_on = precision_policy.enabled("fbank_ring")
        if fring_on and not self._stacked and not self.is_vad:
            # (geometry admission — hop grid, step divisibility, edge
            # context — lives in fbank_ring_spec, which returns None for
            # anything the decomposition doesn't cover)
            mod = embedding.module
            if getattr(mod, "fbank_ring_kind", None) is not None and hasattr(
                mod, "trunk_from_raw_fbank"
            ):
                self._fring = fbank_ring_spec(
                    mod.fbank_ring_kind,
                    int(mod.num_mels),
                    int(getattr(mod, "sample_rate", self.sample_rate)),
                    self.chunk_samples,
                    self.step_samples,
                )
                if self._fring is not None:
                    self._trunk_raw = lambda p, raw: mod.apply(
                        p, raw, method="trunk_from_raw_fbank"
                    )

        self._phase = 0
        with precision_policy.use(self.precision):
            phased_on = precision_policy.enabled("phased_ring")
        if not self._stacked and phased_on:
            # only the models that actually consume the waveform window
            # constrain the layout (an fbank-ring embedding never sees it)
            mods = [segmentation.module] + (
                []
                if self.is_vad or self._fring is not None
                else [embedding.module]
            )
            strides = {
                _sincnet_geometry(m)[0] for m in mods if m is not None
            }
            if (
                all(m is not None for m in mods)
                and all(getattr(m, "supports_phased_wave", False) for m in mods)
                and len(strides) == 1
            ):
                s = strides.pop()
                if (
                    s > 1
                    and self.chunk_samples % s == 0
                    and self.step_samples % s == 0
                ):
                    self._phase = s

        # Probe the frame grid once (traced shapes are static thereafter).
        with precision_policy.use(self.precision):
            probe = jax.eval_shape(
                self._seg_apply,
                self._seg_params,
                jax.ShapeDtypeStruct((1, 1, self.chunk_samples), jnp.float32),
            )
        self.num_frames = probe.shape[1]
        self.num_local = probe.shape[2]

        score_dims = 1 if self.is_vad else max_speakers
        self.geometry: AggregationGeometry = build_geometry(
            duration, step, self.latency, self.num_frames, strategy="hamming"
        )
        self._score_dims = score_dims

        donate = (1,)  # state buffers update in place
        step_fn = self._step_impl
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            stream_sharding = NamedSharding(mesh, P("streams"))
            replicated = NamedSharding(mesh, P())
            state_shardings = StreamState(
                audio=stream_sharding,
                ring=stream_sharding,
                centers=stream_sharding,
                center_active=stream_sharding,
                initialized=stream_sharding,
                chunk_count=stream_sharding,
            )
            out_shardings = (
                state_shardings,
                StepOutput(stream_sharding, stream_sharding, stream_sharding),
            )
            self._step = jax.jit(
                step_fn,
                donate_argnums=donate,
                in_shardings=(
                    replicated,
                    state_shardings,
                    stream_sharding,
                    stream_sharding,
                    stream_sharding,
                    replicated,  # hparams
                ),
                out_shardings=out_shardings,
            )
        else:
            self._step = jax.jit(step_fn, donate_argnums=donate)

        self._params = (
            (self._seg_params, self._emb_params)
            if not self.is_vad
            else (self._seg_params,)
        )
        # device-resident all-true masks for the common "every stream active"
        # case — re-uploading a fresh host array every hop costs a
        # host->device transfer per step (latency-priced in this dev env's
        # network tunnel, and pure waste everywhere)
        self._true_masks: dict = {}

    # ------------------------------------------------------------------ #
    def set_hyperparameters(
        self,
        tau_active: Optional[float] = None,
        rho_update: Optional[float] = None,
        delta_new: Optional[float] = None,
        gamma: Optional[float] = None,
        beta: Optional[float] = None,
    ) -> None:
        """Update tunable hyper-parameters WITHOUT recompiling the step."""
        old = getattr(self, "_hparams", None)
        get = lambda new, i: (
            jnp.float32(new) if new is not None else old[i]
        )
        self._hparams = (
            get(tau_active, 0),
            get(rho_update, 1),
            get(delta_new, 2),
            get(gamma, 3),
            get(beta, 4),
        )

    @property
    def cluster_params(self) -> ClusteringParams:
        return ClusteringParams(*self._hparams[:3])

    @property
    def gamma(self) -> float:
        return float(self._hparams[3])

    @property
    def beta(self) -> float:
        return float(self._hparams[4])

    # ------------------------------------------------------------------ #
    def _audio_init(self, b: int):
        """The initial value of the audio-state pytree for ``b`` streams.

        In fbank-ring mode the ring's not-yet-streamed frames must hold the
        frames of an all-zero signal (a NONZERO constant for log features)
        so warm-up windows reproduce the direct path's zero-filled
        semantics exactly; everything else starts at zero."""
        window_shape = (
            (b, self._phase, self.chunk_samples // self._phase)
            if self._phase
            else (b, self.chunk_samples)
        )
        window = jnp.zeros(window_shape, jnp.float32)
        if self._fring is None:
            return window
        s = self._fring
        fill = jnp.asarray(fbank_ring_fill(s))
        return {
            "window": window,
            "ring": jnp.broadcast_to(
                fill, (b, s.nb * s.fpb, s.num_mels)
            ).astype(jnp.float32),
            # per-block window-start samples, chronological — head[:, 0] is
            # the oldest block's, exactly what the left-edge frames need
            "head": jnp.zeros((b, s.nb, max(s.head_len, 1)), jnp.float32),
            "tail": jnp.zeros((b, max(s.tail_len, 1)), jnp.float32),
        }

    def init_state(self, batch_size: Optional[int] = None) -> StreamState:
        b = batch_size or self.batch_size
        W = self.geometry.num_windows
        state = StreamState(
            audio=self._audio_init(b),
            ring=jnp.zeros((b, W, self.num_frames, self._score_dims), jnp.float32),
            centers=jnp.zeros((b, self.max_speakers, self.embedding_dim), jnp.float32),
            center_active=jnp.zeros((b, self.max_speakers), bool),
            initialized=jnp.zeros((b,), bool),
            chunk_count=jnp.zeros((b,), jnp.int32),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P("streams"))
            state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), state
            )
        return state

    def reset_stream(self, state: StreamState, index: int) -> StreamState:
        """Reset one stream's slot to its initial value (new session
        joining the batch). One-hot wrapper over :meth:`reset_streams`."""
        mask = np.zeros((state.initialized.shape[0],), bool)
        mask[index] = True
        return self.reset_streams(state, mask)

    def reset_streams(self, state: StreamState, mask) -> StreamState:
        """Reset every stream slot where ``mask`` is True to its initial
        value, in ONE compiled call.

        The mask is a DYNAMIC input, so every reset set — single slot,
        client churn batch, full wipe — reuses the same executable. (The
        previous per-index eager ``at[index].set`` formulation compiled a
        new program per index and paid a chain of device round trips per
        client claim, which serialized admission in the streaming server.)
        The audio state resets to ``_audio_init``'s row — NOT zero: a mel
        frame ring's empty slots hold the nonzero zero-signal constant."""
        if getattr(self, "_audio_row", None) is None:
            self._audio_row = jax.tree_util.tree_map(
                lambda t: t[0], self._audio_init(1)
            )
        if getattr(self, "_reset_fn", None) is None:

            def _reset(state, mask, row):
                def keep(cur, init):
                    m = mask.reshape((-1,) + (1,) * (cur.ndim - 1))
                    return jnp.where(m, init, cur)

                return StreamState(
                    audio=jax.tree_util.tree_map(
                        lambda cur, r: keep(cur, r.astype(cur.dtype)[None]),
                        state.audio,
                        row,
                    ),
                    ring=keep(state.ring, jnp.zeros((), state.ring.dtype)),
                    centers=keep(
                        state.centers, jnp.zeros((), state.centers.dtype)
                    ),
                    center_active=keep(state.center_active, False),
                    initialized=keep(state.initialized, False),
                    chunk_count=keep(state.chunk_count, jnp.int32(0)),
                )

            self._reset_fn = jax.jit(_reset, donate_argnums=0)
        mask = jnp.asarray(mask)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mask = jax.device_put(mask, NamedSharding(self.mesh, P("streams")))
        return self._reset_fn(state, mask, self._audio_row)

    # ------------------------------------------------------------------ #
    def _stacked_frontend(self, wave: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One 160-channel sinc conv + pool for both models' filterbanks on
        the shared standardized waveform. wave: (B, 1, samples) ->
        (seg_pooled, emb_pooled), each (B, 80, pooled_frames)."""
        sp, ep = self._sinc_seg, self._sinc_emb
        stride, kernel_size, min_low, min_band, sinc_rate = self._sinc_geometry
        mean = jnp.mean(wave, axis=-1, keepdims=True)
        var = jnp.var(wave, axis=-1, keepdims=True)
        z = (wave - mean) * jax.lax.rsqrt(var + 1e-5)
        synth = lambda p: sinc_filters(
            p["low"],
            p["band"],
            kernel_size=kernel_size,
            sample_rate=sinc_rate,
            min_low_hz=min_low,
            min_band_hz=min_band,
        )
        fs, fe = synth(sp), synth(ep)
        filters = jnp.concatenate([fs * sp["scale"], fe * ep["scale"]], axis=0)
        bias = jnp.concatenate(
            [sp["bias"] * jnp.sum(fs, axis=1), ep["bias"] * jnp.sum(fe, axis=1)]
        )
        y = jax.lax.conv_general_dilated(
            z,
            filters[:, None, :],
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        pooled = frontend_pool(y + bias[None, :, None])
        split = fs.shape[0]
        return pooled[:, :split], pooled[:, split:]

    def _fring_advance(self, st: dict, blocks: jnp.ndarray, audio_mask):
        """Advance the embedding's incremental mel-frontend state by one hop
        and assemble the CURRENT window's raw log-mel frames.

        st: the fbank-ring sub-state {"ring", "head", "tail"} (see
        ``_audio_init``); blocks: (B, step_samples) f32. Returns
        (new_st, raw) with raw (B, T_w, mels) — the cached-stage log-mel
        features of the window, pre-normalization, exactly what
        ``trunk_from_raw_fbank`` consumes.

        Everything here is a static slice+concat with a per-stream masked
        select (the same pattern as the waveform window): a paused stream's
        ring/head/tail freeze wholesale. No dynamic indexing — see the
        class-level fbank_ring comment for the measured rejections.
        """
        spec = self._fring
        keep = lambda new, old: jnp.where(
            audio_mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )
        y = fbank_block_raw(spec, st["tail"], blocks)  # (B, fpb, mels)
        ring = keep(
            jnp.concatenate([st["ring"][:, spec.fpb :], y], axis=1),
            st["ring"],
        )
        head = st["head"]
        if spec.edge:
            head = keep(
                jnp.concatenate(
                    [head[:, 1:], blocks[:, None, : spec.head_len]], axis=1
                ),
                head,
            )
        tail = keep(blocks[:, -st["tail"].shape[1] :], st["tail"])

        interior = ring[:, spec.trim : spec.trim + spec.interior]
        if spec.edge:
            left = fbank_edge_left(spec, head[:, 0, : spec.head_len])
            right = fbank_edge_right(spec, tail)
            raw = jnp.concatenate([left, interior, right], axis=1)
        else:
            raw = interior
        return {"ring": ring, "head": head, "tail": tail}, raw

    def _frame_scores(
        self,
        audio: jnp.ndarray,
        gamma: jnp.ndarray,
        beta: jnp.ndarray,
        emb_raw: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, samples) or phase-major (B, s, samples/s) ->
        (segmentation (B, F, K), embeddings (B, K, E)). ``emb_raw``: the
        fbank-ring path's assembled pre-normalization log-mel frames — the
        embedding model then skips its frontend stage
        (``trunk_from_raw_fbank``) and never sees the waveform."""
        seg_kw, emb_kw = {}, {}
        if self._phase:
            wave = audio  # models consume the phase-major layout directly
            seg_kw = {"phased": True}
            emb_kw = {"phased": True}
        else:
            wave = audio[:, None, :]
        if self._stacked:
            seg_pooled, emb_pooled = self._stacked_frontend(wave)
            seg_kw = {"sinc_pooled": seg_pooled}
            emb_kw = {"sinc_pooled": emb_pooled}
        seg = self._seg_apply(self._seg_params, wave, **seg_kw)  # (B, F, K)
        if self.is_vad:
            return seg, jnp.zeros((seg.shape[0], 1, 1), seg.dtype)
        weights = overlapped_speech_penalty(seg, gamma, beta)
        if self.normalize_weights:
            weights = min_max_normalize(weights, axis=-2)
        if emb_raw is not None:
            frames = self._trunk_raw(self._emb_params, emb_raw)  # (B, T, C)
        else:
            frames = self._trunk(self._emb_params, wave, **emb_kw)
        emb = self._head(
            self._emb_params, frames, jnp.swapaxes(weights, 1, 2)
        )  # (B, K, E)
        emb = normalize_embeddings(emb, 1.0)
        return seg, emb

    def _advance_audio(self, audio_state, blocks: jnp.ndarray, audio_mask):
        """Ingest one hop's blocks into the rolling audio state.

        Returns ``(new_audio_state, window, emb_raw)`` — the advanced state
        pytree, the waveform window the models consume (phase-major when the
        phased ring is engaged), and the fbank-ring path's assembled raw
        log-mel frames (None otherwise). Shared by the serving step and the
        non-mutating :meth:`probe_frame_scores` diagnostic."""
        if jnp.issubdtype(blocks.dtype, jnp.integer):
            # int16 PCM ingestion: audio is quantized on the host so every
            # hop ships half the bytes over PCIe/ICI (and most sources are
            # 16-bit PCM to begin with); dequantize on device.
            blocks = blocks.astype(jnp.float32) / 32768.0
        emb_raw = None
        window = audio_state["window"] if self._fring is not None else audio_state
        if self._phase:
            s = self._phase
            # incoming 0.5 s block -> its phase-major view (B, s, hops);
            # the ring shift then runs entirely in the conv's layout
            new = jnp.swapaxes(
                blocks.reshape(blocks.shape[0], -1, s), 1, 2
            )
            rolled = jnp.concatenate(
                [window[:, :, self.step_samples // s :], new], axis=2
            )
            window = jnp.where(audio_mask[:, None, None], rolled, window)
        else:
            rolled = jnp.concatenate(
                [window[:, self.step_samples :], blocks], axis=1
            )
            window = jnp.where(audio_mask[:, None], rolled, window)
        if self._fring is not None:
            fst, emb_raw = self._fring_advance(audio_state, blocks, audio_mask)
            audio = dict(fst, window=window)
        else:
            audio = window
        return audio, window, emb_raw

    def probe_frame_scores(
        self,
        state: StreamState,
        blocks,
        audio_mask: Optional[np.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Diagnostic: the (segmentation, embedding) tensors the next step
        WOULD compute after ingesting ``blocks`` — without mutating
        ``state``. Fidelity probes use this to compare fast paths at the
        raw-tensor level at production geometry (e.g. fbank_ring vs the
        direct frontend, scripts/fring_fidelity.py); it is a separate lazily
        compiled executable and ships embeddings to the host, so it is NOT
        part of the serving loop. Returns ``(seg (B, F, K), emb (B, K, E))``
        with embeddings L2-normalized, exactly as the step consumes them."""
        b = jnp.shape(blocks)[0]
        mask = (
            jnp.ones((b,), bool) if audio_mask is None else jnp.asarray(audio_mask)
        )
        if getattr(self, "_probe_fn", None) is None:
            def _probe(params, state, blocks, audio_mask, hparams):
                del params
                _, _, _, gamma, beta = hparams
                _, window, emb_raw = self._advance_audio(
                    state.audio, blocks, audio_mask
                )
                return self._frame_scores(window, gamma, beta, emb_raw=emb_raw)

            self._probe_fn = jax.jit(_probe)
        if not isinstance(blocks, jax.Array):
            blocks = np.asarray(blocks)
            if not np.issubdtype(blocks.dtype, np.integer):
                blocks = blocks.astype(np.float32, copy=False)
        with precision_policy.use(self.precision):
            return self._probe_fn(
                self._params, state, jnp.asarray(blocks), mask, self._hparams
            )

    def _step_impl(
        self,
        params,
        state: StreamState,
        blocks: jnp.ndarray,
        audio_mask: jnp.ndarray,
        run_mask: jnp.ndarray,
        hparams=None,
    ) -> Tuple[StreamState, StepOutput]:
        """audio_mask: streams that received a new block (ring advances);
        run_mask: streams whose 5 s window is full (chunk is processed).
        During the first duration/step - 1 hops a stream warms up with
        audio_mask=True, run_mask=False — matching the reference re-chunker,
        which only emits once a full chunk accumulated (operators.py:92-99).
        hparams: (tau, rho, delta, gamma, beta) scalars — dynamic so tuning
        sweeps share one executable.
        """
        del params  # bound via self; placed here for sharding annotations
        if hparams is None:
            hparams = self._hparams
        tau, rho, delta, gamma, beta = hparams
        cluster_params = ClusteringParams(tau, rho, delta)
        audio, window, emb_raw = self._advance_audio(
            state.audio, blocks, audio_mask
        )
        seg, emb = self._frame_scores(window, gamma, beta, emb_raw=emb_raw)

        # streams not running this step keep their state
        keep = lambda new, old: jnp.where(
            run_mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
        )

        if self.is_vad:
            # (blocks/vad.py:146-148): speech score = max over speakers
            permuted = jnp.max(seg, axis=-1, keepdims=True)
            new_centers = state.centers
            new_active = state.center_active
            new_init = state.initialized
        else:
            cstate = ClusteringState(
                centers=state.centers,
                active=state.center_active,
                initialized=state.initialized,
            )
            new_cstate, permuted, _ = jax.vmap(
                lambda cs, s, e: cluster_step(cs, s, e, cluster_params)
            )(cstate, seg, emb)
            new_centers = keep(new_cstate.centers, state.centers)
            new_active = keep(new_cstate.active, state.center_active)
            new_init = keep(new_cstate.initialized, state.initialized)

        ring = jnp.roll(state.ring, 1, axis=1).at[:, 0].set(permuted)
        count = state.chunk_count + run_mask.astype(jnp.int32)
        agg = jax.vmap(lambda r, c: aggregate(self.geometry, r, c))(ring, count)

        new_state = StreamState(
            audio=audio,
            ring=keep(ring, state.ring),
            centers=new_centers,
            center_active=new_active,
            initialized=new_init,
            chunk_count=count,
        )
        return new_state, StepOutput(
            aggregated=agg, newest=permuted, chunk_index=count - 1
        )

    # ------------------------------------------------------------------ #
    def step(
        self,
        state: StreamState,
        blocks: np.ndarray,
        audio_mask: Optional[np.ndarray] = None,
        run_mask: Optional[np.ndarray] = None,
    ) -> Tuple[StreamState, StepOutput]:
        """Advance all streams by one hop.

        blocks: (B, step_samples) host audio — float32 in [-1, 1], or int16
            PCM (half the host->device bytes; dequantized on device).
        audio_mask: (B,) bool — streams that received a new block.
        run_mask: (B,) bool — streams whose chunk window is full and should
            be processed (False while warming up or idle).
        """
        b = blocks.shape[0]
        if audio_mask is None or run_mask is None:
            true_mask = self._true_masks.get(b)
            if true_mask is None:
                true_mask = jnp.ones((b,), bool)
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    true_mask = jax.device_put(
                        true_mask, NamedSharding(self.mesh, P("streams"))
                    )
                self._true_masks[b] = true_mask
            if audio_mask is None:
                audio_mask = true_mask
            if run_mask is None:
                run_mask = true_mask
        # Device-resident blocks pass through untouched (serving loops and
        # the benchmark pre-stage blocks on device; a host round-trip here
        # would dominate the step). Host arrays are cast so float64 never
        # reaches the compiled step; integer dtypes (int16 PCM) dequantize
        # on device.
        if not isinstance(blocks, jax.Array):
            blocks = np.asarray(blocks)
            if not np.issubdtype(blocks.dtype, np.integer):
                blocks = blocks.astype(np.float32, copy=False)
        # The policy context matters only on the FIRST call (trace time);
        # afterwards the compiled executable is fixed and the context is a
        # few hundred ns of bookkeeping against a ~10 ms step.
        with precision_policy.use(self.precision):
            return self._step(
                self._params,
                state,
                jnp.asarray(blocks),
                jnp.asarray(audio_mask),
                jnp.asarray(run_mask),
                self._hparams,
            )

    # ------------------------------------------------------------------ #
    def step_cost_analysis(self, state: StreamState, blocks) -> Optional[dict]:
        """XLA cost-model analysis of one step program (``{'flops': ...,
        'bytes accessed': ...}``), from the lowered (pre-optimization) HLO —
        the basis for the benchmark's absolute-utilization (MFU) figure.
        Returns None when the backend exposes no cost model."""
        masks = jnp.ones((jnp.shape(blocks)[0],), bool)
        with precision_policy.use(self.precision):
            lowered = self._step.lower(
                self._params, state, jnp.asarray(blocks), masks, masks,
                self._hparams,
            )
        try:
            analysis = lowered.cost_analysis()
            if analysis is None:
                # some PJRT plugins (e.g. the axon remote-TPU tunnel) only
                # expose the cost model post-compile; the persistent
                # compilation cache makes this a cache load, not a rebuild
                analysis = lowered.compile().cost_analysis()
        except Exception:
            return None
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0] if analysis else None
        return analysis

    # ------------------------------------------------------------------ #
    # Output timestamp helpers (host side)
    # ------------------------------------------------------------------ #
    @property
    def output_resolution(self) -> float:
        return self.geometry.out_resolution

    def output_start(self, chunk_index: int) -> float:
        """Start time of the aggregated region for a given chunk index
        (aggregation.py:214-217: ``end - latency``)."""
        return chunk_index * self.step_duration + self.duration - self.latency
