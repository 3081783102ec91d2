"""Explicit numerics / fast-path policy for the TPU execution paths.

The TPU fast paths (Pallas kernels, reduced-precision intermediate storage,
frontend stacking) used to be controlled exclusively by ambient environment
variables, so reproducing a perf or DER figure required pinning process
state and nothing recorded which switches a run used. This module makes the
policy an explicit, serializable value:

* :class:`Precision` — a frozen dataclass with one field per fast path.
  The defaults reproduce the flagship serving configuration.
* :func:`enabled` — what the compute code consults at trace time. It
  resolves, in order: the matching ``DIART_TPU_*`` env var if set
  (operational opt-out, highest precedence), then the active policy, and
  finally gates TPU-only paths on the actual backend (compiled Pallas and
  the bf16 storage paths never run on CPU — hermetic tests and CPU-side
  parameter init always take the portable f32 XLA paths).
* :meth:`Precision.resolved` — the post-resolution switches as a plain
  dict; ``bench.py`` and session checkpoints serialize it so every artifact
  states exactly which fast paths were active.
* :func:`use` — scoped activation; :class:`MultiStreamEngine` wraps its
  traces in ``use(self.precision)`` so an engine's policy is explicit
  construction state rather than ambient process state.

Env var mapping (``0``/``false``/``off``/empty disables, anything else
enables): ``DIART_TPU_PALLAS_LSTM``, ``DIART_TPU_PALLAS_HEAD``,
``DIART_TPU_PALLAS_ATTN``, ``DIART_TPU_PALLAS_RES2``,
``DIART_TPU_BF16_LSTM``, ``DIART_TPU_BF16_FRONTEND``,
``DIART_TPU_STACK_FRONTEND``, ``DIART_TPU_INT8_TRUNK``,
``DIART_TPU_FAST_FBANK``, ``DIART_TPU_PHASED_RING``,
``DIART_TPU_FBANK_RING``, ``DIART_TPU_LSTM_BLOCK``.
"""

from __future__ import annotations

import dataclasses
import os
import threading
from contextlib import contextmanager
from typing import Dict, Optional

import jax

__all__ = ["Precision", "active", "enabled", "set_default", "use"]


_ENV_VARS = {
    "pallas_lstm": "DIART_TPU_PALLAS_LSTM",
    "pallas_head": "DIART_TPU_PALLAS_HEAD",
    "pallas_attn": "DIART_TPU_PALLAS_ATTN",
    "pallas_res2": "DIART_TPU_PALLAS_RES2",
    "bf16_lstm": "DIART_TPU_BF16_LSTM",
    "bf16_frontend": "DIART_TPU_BF16_FRONTEND",
    "stack_frontend": "DIART_TPU_STACK_FRONTEND",
    "int8_trunk": "DIART_TPU_INT8_TRUNK",
    "fast_fbank": "DIART_TPU_FAST_FBANK",
    "phased_ring": "DIART_TPU_PHASED_RING",
    "fbank_ring": "DIART_TPU_FBANK_RING",
    "lstm_block": "DIART_TPU_LSTM_BLOCK",
}
# Paths that only exist for TPU backends (Pallas lowering, bf16 storage
# layouts); they resolve to False anywhere else no matter what the policy
# or the env says.
_TPU_ONLY = frozenset(
    (
        "pallas_lstm",
        "pallas_head",
        "pallas_attn",
        "pallas_res2",
        "bf16_lstm",
        "bf16_frontend",
        "fast_fbank",
        "lstm_block",
    )
)


@dataclasses.dataclass(frozen=True)
class Precision:
    """One switch per TPU fast path. All parity-tested against their
    portable XLA formulations (see PARITY.md); defaults = the flagship
    serving configuration measured in PERF.md.

    pallas_lstm: fused Pallas LSTM sweep kernel (ops/pallas_lstm.py).
    pallas_head: fused projection+statistics embedding head
        (ops/pallas_stats.py).
    pallas_attn: fused channel-attention + weighted statistics pooling for
        the ECAPA/TitaNet heads (ops/pallas_attn_stats.py).
    pallas_res2: each ECAPA SE-Res2Block as one fused kernel
        (ops/pallas_res2.py).
    bf16_lstm: bf16 storage for the LSTM's pre-projected gate stream
        (cell state and gate math stay f32).
    bf16_frontend: bf16 storage for the pre-pool SincNet activation
        (instance-norm math stays f32).
    stack_frontend: fold both models' distinct SincNet filterbanks into one
        stacked frontend convolution (measured slower on v5e — default off;
        see PERF.md "Measured and rejected").
    int8_trunk: dynamic int8 quantization of the FLOP-bound embedding trunk
        convolutions (ops/quant.py) — per-sample activation scales,
        per-output-channel weight scales, s8xs8->s32 on the MXU.
        Measured on v5e (PERF.md "TPU-verified round 3"): a −7% step-time
        win for ECAPA, neutral for the x-vector families, SLOWER for
        ResNet34/TitaNet — XLA's s8 conv emitter only reaches 1.03–1.09×
        the bf16 rate, so the dynamic-quantization glue wins or loses on
        how concentrated the trunk's matmul cost is. Inference-only and
        quality-affecting (on-device embedding cosine ≥ 0.99994 vs f32,
        PRECISION.md), default OFF; enable with DIART_TPU_INT8_TRUNK=1 or
        an explicit policy after validating DER on your data. With
        ``pallas_res2`` on, the ECAPA res2 blocks run in the fused kernel
        (bf16) regardless — int8 then applies to the stem/MFA convs only.
    """

    pallas_lstm: bool = True
    pallas_head: bool = True
    pallas_attn: bool = True
    # ON since round 3: compiled-Mosaic parity verified on the chip against
    # a float64 oracle at all three production dilations (the round-2
    # "parity failure" was an ill-conditioned test harness, not a
    # miscompile — see tests/test_pallas_res2.py:_params and
    # scripts/res2_parity_tpu.py); A/B: ECAPA 26.61 -> 25.93 ms at
    # batch 256. Opt out with DIART_TPU_PALLAS_RES2=0.
    pallas_res2: bool = True
    bf16_lstm: bool = True
    bf16_frontend: bool = True
    stack_frontend: bool = False
    int8_trunk: bool = False
    # fast_fbank: run the mel-fbank DFT convolution + mel contraction at
    # matmul Precision.HIGH (3-pass bf16) instead of HIGHEST (6-pass).
    # ON since round 3: on-chip A/Bs win on every mel family (ECAPA −1.28,
    # ResNet34 −1.34, TitaNet −0.99, xvect-sb −0.81 ms/step at batch 256)
    # and on-device embedding cosine vs the serving path is ≥ 0.999995 on a
    # probe stressing quiet log-mel bins (scripts/fbank_fidelity.py,
    # PRECISION.md) — within the default bf16 trunk's existing noise class.
    # Opt out with DIART_TPU_FAST_FBANK=0.
    fast_fbank: bool = True
    # phased_ring: the multi-stream engine stores its rolling audio window
    # pre-transposed in the SincNet convolution's phase-major layout
    # (B, stride, samples/stride), so the per-step full-window relayout
    # (~0.46 ms at batch 256) happens only for the incoming 0.5 s block.
    # Pure layout change — identical contraction values; engaged on every
    # backend when all models in the engine accept the layout.
    phased_ring: bool = True
    # fbank_ring: incremental mel frontend — every log-mel stage up to the
    # window-level normalization is frame-local (models/fbank.py
    # "Incremental mel frontends"), so the embedding's raw log-mel frames of
    # the 4.5 s of unchanged samples live in a chronological device ring
    # across hops; each step computes only the incoming block's frames (plus
    # the window-edge frames, whose padding depends on the window position)
    # and the full-window DFT convolution disappears from the step. The ring
    # advances by a static slice+concat per hop (per-stream pause/resume via
    # masked select) — per-stream DYNAMIC indexing formulations were all
    # measured far over roofline on v5e and rejected (PERF.md "conv_ring";
    # scripts/convring_isolate.py). Engine-level parity pinned by
    # tests/test_fbank_ring.py. ON since round 4: on-chip A/Bs win on every
    # mel family (ECAPA 25.36->23.84 ms, xvect-sb 16.76->15.10, ResNet34
    # 55.74->53.90, TitaNet 44.69->42.15 at batch 256; docs/campaigns/r4/
    # fring_ab_*.txt) and the production-geometry on-chip fidelity probe
    # (scripts/fring_fidelity.py) pins embedding cosine vs the direct
    # serving path through warm-up, steady state, pause/resume and slot
    # resets. Opt out with DIART_TPU_FBANK_RING=0.
    fbank_ring: bool = True
    # lstm_block: DMA-blocked LSTM sweep kernel — `DIART_TPU_LSTM_BLOCK_K`
    # (default 8) timesteps per double-buffered fetch/writeback DMA pair
    # instead of 4 DMA start/waits per timestep (ops/pallas_lstm.py
    # `_lstm_block_kernel`). Bit-exact vs the per-timestep kernel (same
    # gate math, same order; parity in tests/test_ops.py and compiled
    # on-chip). ON since round 5: the engine-level on-chip A/B wins on both
    # LSTM-dominated pipelines (flagship 12.91->12.58 ms, -2.5%; VAD
    # 7.73->7.45 ms, -3.6%; docs/campaigns/r5/r5_lstm_ab*.txt) and the
    # kernel-level sweep agrees (block=8 is 2.35x the per-step kernel at
    # the production geometry, bf16 7.20->3.06 ms/layer, bit-exact;
    # r5_lstm_kernel.txt — measured with a D2H-fetch sync; the earlier
    # "per-step faster" reading was the unsynchronized dispatch time).
    # Opt out with DIART_TPU_LSTM_BLOCK=0.
    lstm_block: bool = True

    def resolved(self) -> Dict[str, bool]:
        """The switches as they would actually resolve right now (env
        overrides + backend gate applied) — serialize THIS into artifacts."""
        return {f: _resolve(self, f) for f in _ENV_VARS}

    def as_dict(self) -> Dict[str, bool]:
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d: Dict[str, bool]) -> "Precision":
        known = {f.name for f in dataclasses.fields(Precision)}
        return Precision(**{k: bool(v) for k, v in d.items() if k in known})

    @staticmethod
    def parse(spec: str) -> "Precision":
        """Build a policy from a ``field=0|1,...`` spec on top of the
        flagship defaults — the format the CLIs' ``--precision`` flag and
        ``bench.py --set`` accept (e.g. ``"int8_trunk=1,pallas_res2=0"``).
        A bare switch name without ``=`` means enable (``"int8_trunk"`` ==
        ``"int8_trunk=1"``) — silently treating it as disable would invert
        the user's intent."""
        overrides: Dict[str, bool] = {}
        known = {f.name for f in dataclasses.fields(Precision)}
        for item in spec.split(","):
            if not item.strip():
                continue
            key, sep, value = item.partition("=")
            key = key.strip()
            if key not in known:
                raise ValueError(
                    f"unknown precision switch {key!r}; known: {sorted(known)}"
                )
            overrides[key] = (
                value.strip().lower() not in ("0", "false", "off", "")
                if sep
                else True
            )
        return dataclasses.replace(Precision(), **overrides)

    @staticmethod
    def portable() -> "Precision":
        """Everything off: the pure-XLA f32 reference formulation."""
        return Precision(
            pallas_lstm=False,
            pallas_head=False,
            pallas_attn=False,
            pallas_res2=False,
            bf16_lstm=False,
            bf16_frontend=False,
            stack_frontend=False,
            int8_trunk=False,
            fast_fbank=False,
            phased_ring=False,
            fbank_ring=False,
            lstm_block=False,
        )


_DEFAULT = Precision()
_STATE = threading.local()


def _resolve(policy: Precision, field: str) -> bool:
    if field in _TPU_ONLY and jax.default_backend() != "tpu":
        return False
    if not getattr(_STATE, "force", False):
        env = os.environ.get(_ENV_VARS[field])
        if env is not None:
            # same falsy spellings as Precision.parse — "false"/"off"/""
            # must not silently ENABLE a quality-affecting switch
            return env.strip().lower() not in ("0", "false", "off", "")
    return bool(getattr(policy, field))


def active() -> Precision:
    """The policy in effect: the innermost :func:`use` scope, else the
    process default."""
    return getattr(_STATE, "policy", None) or _DEFAULT


def enabled(field: str) -> bool:
    """Trace-time query used by the compute code paths."""
    if field not in _ENV_VARS:
        raise KeyError(f"unknown precision switch {field!r}; known: {sorted(_ENV_VARS)}")
    return _resolve(active(), field)


def set_default(policy: Precision) -> None:
    """Set the process-wide default policy (affects subsequently traced
    programs; already-compiled executables are unchanged)."""
    global _DEFAULT
    _DEFAULT = policy


@contextmanager
def use(policy: Precision, force: bool = False):
    """Scoped policy activation (thread-local). ``force=True`` additionally
    ignores env overrides — used by CPU-side parameter initialization, which
    must run the portable paths even when a user pinned a fast path on."""
    prev_policy = getattr(_STATE, "policy", None)
    prev_force = getattr(_STATE, "force", False)
    _STATE.policy = policy
    _STATE.force = force
    try:
        yield policy
    finally:
        _STATE.policy = prev_policy
        _STATE.force = prev_force
