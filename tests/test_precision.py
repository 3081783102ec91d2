"""Precision policy: explicit fast-path configuration (VERDICT r1 weak 7).

The numerics policy is a first-class serializable object; env vars are
overrides, not the source of truth. On the CPU test backend every TPU-only
switch must resolve to False regardless of policy or env."""

import json
import os

import numpy as np
import pytest

from diart_tpu import precision
from diart_tpu.precision import Precision


class TestResolution:
    def test_defaults_match_flagship(self):
        p = Precision()
        assert p.pallas_lstm and p.pallas_head
        assert p.bf16_lstm and p.bf16_frontend
        assert not p.stack_frontend

    def test_tpu_only_paths_resolve_off_on_cpu(self):
        # conftest pins the CPU backend: whatever the policy says, the
        # Pallas/bf16 switches must come back False
        with precision.use(Precision()):
            for field in ("pallas_lstm", "pallas_head", "bf16_lstm", "bf16_frontend"):
                assert precision.enabled(field) is False

    def test_stack_frontend_is_portable(self):
        with precision.use(Precision(stack_frontend=True)):
            assert precision.enabled("stack_frontend") is True
        with precision.use(Precision(stack_frontend=False)):
            assert precision.enabled("stack_frontend") is False

    def test_env_overrides_policy(self, monkeypatch):
        monkeypatch.setenv("DIART_TPU_STACK_FRONTEND", "1")
        with precision.use(Precision(stack_frontend=False)):
            assert precision.enabled("stack_frontend") is True
        monkeypatch.setenv("DIART_TPU_STACK_FRONTEND", "0")
        with precision.use(Precision(stack_frontend=True)):
            assert precision.enabled("stack_frontend") is False

    def test_force_beats_env(self, monkeypatch):
        # parameter init forces the portable paths even when a user pinned a
        # fast path on via env
        monkeypatch.setenv("DIART_TPU_STACK_FRONTEND", "1")
        with precision.use(Precision.portable(), force=True):
            assert precision.enabled("stack_frontend") is False

    def test_unknown_switch_raises(self):
        with pytest.raises(KeyError):
            precision.enabled("not_a_switch")

    def test_scopes_nest_and_restore(self):
        base = precision.active()
        with precision.use(Precision(stack_frontend=True)) as outer:
            assert precision.active() is outer
            with precision.use(Precision.portable()) as inner:
                assert precision.active() is inner
            assert precision.active() is outer
        assert precision.active() is base

    def test_round_trip_dict(self):
        p = Precision(bf16_lstm=False, stack_frontend=True)
        q = Precision.from_dict(json.loads(json.dumps(p.as_dict())))
        assert q == p
        # unknown keys (forward compatibility) are ignored
        assert Precision.from_dict({"bf16_lstm": False, "future": 1}) == Precision(
            bf16_lstm=False
        )

    def test_legacy_shim_still_resolves(self):
        from diart_tpu.models.common import pallas_enabled

        # CPU backend: TPU-only path resolves off through the legacy name too
        assert pallas_enabled("DIART_TPU_PALLAS_LSTM") is False


class TestEngineIntegration:
    def test_engine_captures_and_serializes_policy(self, tmp_path):
        from diart_tpu.models import SegmentationModel
        from diart_tpu.parallel import MultiStreamEngine, MultiStreamSession

        seg = SegmentationModel.from_registry(
            "tpu/pyannet", lstm_hidden=16, lstm_layers=1, linear_dims=(16,),
            init_samples=8000,
        )
        pol = Precision(bf16_frontend=False)
        engine = MultiStreamEngine(
            segmentation=seg,
            embedding=None,
            duration=0.5,
            step=0.25,
            latency=0.25,
            batch_size=2,
            precision=pol,
        )
        assert engine.precision == pol

        session = MultiStreamSession(engine, collect_audio=False)
        rng = np.random.default_rng(0)
        for _ in range(3):
            session.push(
                rng.normal(scale=0.1, size=(2, engine.step_samples)).astype(
                    np.float32
                )
            )
        ckpt = tmp_path / "sess.ckpt"
        session.save(ckpt)
        meta = json.loads(ckpt.with_suffix(".json").read_text())
        assert meta["precision"] == pol.as_dict()
        # resolved view reflects the CPU backend gate
        assert meta["precision_resolved"]["pallas_lstm"] is False
        assert meta["precision_resolved"]["stack_frontend"] is False

    def test_engine_defaults_to_ambient_policy(self):
        from diart_tpu.models import SegmentationModel
        from diart_tpu.parallel import MultiStreamEngine

        seg = SegmentationModel.from_registry(
            "tpu/pyannet", lstm_hidden=16, lstm_layers=1, linear_dims=(16,),
            init_samples=8000,
        )
        with precision.use(Precision(stack_frontend=True)):
            engine = MultiStreamEngine(
                segmentation=seg,
                embedding=None,
                duration=0.5,
                step=0.25,
                latency=0.25,
                batch_size=1,
            )
        assert engine.precision.stack_frontend is True


class TestParseAndCLI:
    def test_parse_spec(self):
        p = Precision.parse("int8_trunk=1,pallas_res2=1,bf16_lstm=0")
        assert p.int8_trunk and p.pallas_res2 and not p.bf16_lstm
        # untouched switches keep the flagship defaults
        assert p.pallas_head is True

    def test_parse_rejects_unknown(self):
        import pytest

        with pytest.raises(ValueError, match="unknown precision switch"):
            Precision.parse("warp_speed=1")

    def test_parse_bare_name_enables(self):
        """'--precision int8_trunk' means enable — silently reading a bare
        name as False would invert the user's intent (ADVICE r3)."""
        p = Precision.parse("int8_trunk,pallas_res2=0")
        assert p.int8_trunk is True and p.pallas_res2 is False
        # an explicit empty value still disables
        assert Precision.parse("int8_trunk=").int8_trunk is False

    def test_cli_precision_arg_sets_process_default(self):
        import argparse

        from diart_tpu.console.stream import apply_precision_arg
        from diart_tpu.precision import active, set_default

        before = active()
        try:
            args = argparse.Namespace(precision="int8_trunk=1")
            apply_precision_arg(args)
            assert active().int8_trunk is True

            args = argparse.Namespace(precision="portable")
            apply_precision_arg(args)
            assert active() == Precision.portable()

            args = argparse.Namespace(precision=None)
            apply_precision_arg(args)  # no-op
            assert active() == Precision.portable()
        finally:
            set_default(before)
