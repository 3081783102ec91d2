"""Mesh provisioning + multi-host (DCN) readiness hook.

Reference scope: diart has no distributed backend (it scales with a process
pool, ``/root/reference/src/diart/inference.py:435-559``); the TPU-native
equivalent is mesh sharding, and multi-host runs only need the coordinator
rendezvous wired (SURVEY.md §5). These tests cover the single-process code
path and the env-driven configuration; a real pod slice uses the identical
entry."""

import subprocess
import sys

import pytest

from diart_tpu.parallel import initialize_distributed, streams_mesh
from diart_tpu.parallel import mesh as mesh_mod


@pytest.fixture(autouse=True)
def _reset_flag(monkeypatch):
    monkeypatch.setattr(mesh_mod, "_distributed_ready", False)
    monkeypatch.delenv("DIART_TPU_COORDINATOR", raising=False)
    monkeypatch.delenv("DIART_TPU_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("DIART_TPU_PROCESS_ID", raising=False)


class TestInitializeDistributed:
    def test_noop_without_coordinator(self):
        assert initialize_distributed() is False

    def test_env_configuration_reaches_jax(self, monkeypatch):
        import jax

        calls = {}
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: calls.update(kw)
        )
        monkeypatch.setenv("DIART_TPU_COORDINATOR", "10.0.0.1:8476")
        monkeypatch.setenv("DIART_TPU_NUM_PROCESSES", "4")
        monkeypatch.setenv("DIART_TPU_PROCESS_ID", "2")
        assert initialize_distributed() is True
        assert calls == {
            "coordinator_address": "10.0.0.1:8476",
            "num_processes": 4,
            "process_id": 2,
        }
        # idempotent: a second call must not re-initialize
        calls.clear()
        assert initialize_distributed() is True
        assert calls == {}

    def test_explicit_args_beat_env(self, monkeypatch):
        import jax

        calls = {}
        monkeypatch.setattr(
            jax.distributed, "initialize", lambda **kw: calls.update(kw)
        )
        monkeypatch.setenv("DIART_TPU_COORDINATOR", "wrong:1")
        assert initialize_distributed(
            "right:2", num_processes=1, process_id=0
        )
        assert calls["coordinator_address"] == "right:2"

    def test_streams_mesh_default_spans_all_devices(self):
        import jax

        mesh = streams_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("streams",)

    def test_provision_unreachable_platform_falls_back_to_cpu(self):
        """A pinned remote platform whose transport is down hangs
        ``jax.devices()`` forever; ``provision_devices`` must decide BEFORE
        first backend init (subprocess probe) and route to the virtual CPU
        mesh instead of initializing the dead platform. Exercised in a fresh
        subprocess with the probe stubbed to 'unreachable'."""
        code = (
            "import jax\n"
            # simulate a sitecustomize-style pin to a remote platform
            "jax.config.update('jax_platforms', 'fakeremote')\n"
            "from diart_tpu.parallel import mesh as m\n"
            "m._probe_default_backend = lambda *a, **k: None\n"
            "assert not m._backend_initialized()\n"
            "m.provision_devices(4)\n"
            "assert len(jax.devices()) >= 4\n"
            "assert jax.devices()[0].platform == 'cpu'\n"
            "print('FALLBACK-OK')\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=120,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr
        assert "FALLBACK-OK" in proc.stdout

    def test_real_single_process_group(self, tmp_path):
        """jax.distributed.initialize with a 1-process group is the exact
        code path a pod slice uses; exercise it for real in a subprocess
        (global distributed state must not leak into this test process)."""
        code = (
            "import os\n"
            "os.environ['DIART_TPU_COORDINATOR'] = 'localhost:45117'\n"
            "os.environ['DIART_TPU_NUM_PROCESSES'] = '1'\n"
            "os.environ['DIART_TPU_PROCESS_ID'] = '0'\n"
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from diart_tpu.parallel import initialize_distributed, streams_mesh\n"
            "assert initialize_distributed() is True\n"
            "assert jax.process_count() == 1\n"
            "mesh = streams_mesh()\n"
            "assert mesh.axis_names == ('streams',)\n"
            "print('DCN-OK')\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=120,
            cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr
        assert "DCN-OK" in proc.stdout
