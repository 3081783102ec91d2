"""Device-mesh helpers for stream-level data parallelism.

The engine scales out by sharding its stream batch over a ``streams`` mesh
axis (XLA inserts the collectives over ICI). These helpers provision the
devices — real chips when available, an N-virtual-device CPU mesh otherwise,
so multi-chip code paths run (tests, dry runs, single-chip dev boxes)
anywhere.

Multi-host (DCN) readiness: :func:`initialize_distributed` wires
``jax.distributed`` from ``DIART_TPU_COORDINATOR`` /
``DIART_TPU_NUM_PROCESSES`` / ``DIART_TPU_PROCESS_ID`` (the standard
coordinator rendezvous — on Cloud TPU pod slices the latter two are
auto-detected and only the coordinator address is needed), after which
``jax.devices()`` is the GLOBAL device list and :func:`streams_mesh`
assembles the global mesh unchanged. Launch the same engine script once per
host with those variables set and the stream batch shards across the whole
slice; within-host shards ride ICI, cross-host collectives ride DCN. With no
coordinator configured everything below is single-process and byte-for-byte
the previous behavior.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["initialize_distributed", "provision_devices", "streams_mesh"]


_distributed_ready = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize ``jax.distributed`` for multi-host execution.

    Arguments default to the ``DIART_TPU_COORDINATOR`` /
    ``DIART_TPU_NUM_PROCESSES`` / ``DIART_TPU_PROCESS_ID`` environment
    variables. A no-op returning False when no coordinator is configured
    (single-process operation); returns True once the process group is up.
    Idempotent — safe to call from every entry point that builds a mesh.
    """
    global _distributed_ready
    if _distributed_ready:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "DIART_TPU_COORDINATOR"
    )
    if not coordinator_address:
        return False

    import jax

    kwargs = {"coordinator_address": coordinator_address}
    num_processes = (
        num_processes
        if num_processes is not None
        else os.environ.get("DIART_TPU_NUM_PROCESSES")
    )
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    process_id = (
        process_id
        if process_id is not None
        else os.environ.get("DIART_TPU_PROCESS_ID")
    )
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    _distributed_ready = True
    return True


def effective_platform() -> str:
    """The JAX platform this process will actually initialize, resolved the
    ONE way every diart_tpu entry point agrees on: the ``DIART_TPU_PLATFORM``
    knob, then an in-process ``jax.config`` override (e.g. a sitecustomize
    pin or a test harness forcing CPU — it shadows the env var), then the
    ``JAX_PLATFORMS`` env var. Empty string = JAX's default selection
    (which may still pick a remote plugin — treat as unknown, not as
    local)."""
    knob = os.environ.get("DIART_TPU_PLATFORM")
    if knob:
        return knob
    import sys

    if "jax" in sys.modules:
        import jax

        value = jax.config.jax_platforms
        if value:
            return value
    return os.environ.get("JAX_PLATFORMS", "")


_probe_results: dict = {}


def _probe_default_backend(
    platform: str = "", timeout: float = 120.0
) -> Optional[int]:
    """Device count of ``platform`` (or the default selection when empty),
    probed in a SUBPROCESS so an unreachable remote platform (e.g. a dead
    tunnel to a remote TPU) cannot hang this process — in-process
    ``jax.devices()`` blocks indefinitely inside the backend factory when
    the platform's transport is down, and the init lock makes any
    thread-level timeout + retry deadlock. The parent's resolved platform is
    passed to the child via ``JAX_PLATFORMS`` so an in-process
    ``jax.config`` pin probes the same backend it pins (a sitecustomize
    that re-pins in the child shadows it identically on both sides).
    Returns ``None`` when the probe fails or times out (treat as "platform
    unreachable"); results are memoized per platform for the process
    lifetime so stacked entry points (bench → provision_devices) pay one
    handshake, not three."""
    if platform in _probe_results:
        return _probe_results[platform]
    import subprocess
    import sys

    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
    result = None
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True,
            timeout=timeout,
            text=True,
            env=env,
        )
        if out.returncode == 0 and out.stdout.strip():
            result = int(out.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, OSError, ValueError):
        pass
    _probe_results[platform] = result
    return result


def _backend_initialized() -> bool:
    import jax._src.xla_bridge as _xb

    return bool(getattr(_xb, "_backends", None))


def provision_devices(n_devices: int) -> None:
    """Ensure ``n_devices`` JAX devices exist, provisioning a virtual CPU
    mesh if the real backend has fewer.

    Safe to call before or after JAX backend initialization. Environments may
    pin a platform via sitecustomize (shadowing the ``JAX_PLATFORMS`` env
    var); ``jax.config.update`` wins over that pin, but after the backend has
    been initialized both the backend table and ``get_backend``'s cache must
    be cleared for the switch to take effect. ``jax_num_cpu_devices`` (rather
    than the ``XLA_FLAGS`` host-device-count flag) sizes the CPU backend
    because ``XLA_FLAGS`` is parsed once at first backend init.

    Before the first backend init the default platform is probed in a
    subprocess (:func:`_probe_default_backend`): a remote-TPU tunnel that is
    down would hang ``jax.devices()`` forever, and a single remote chip can
    never satisfy a multi-device request anyway — both cases route straight
    to the virtual CPU mesh without ever initializing the remote platform.
    ``DIART_TPU_PLATFORM=cpu`` skips the probe entirely.

    In a multi-host process group the device set is fixed by the slice
    topology; asking for more devices than the group provides is an error
    rather than a silent virtual-CPU downgrade.
    """
    import jax

    if not _backend_initialized() and not _distributed_ready:
        # (in a process group the probe subprocess would only see its host's
        # local devices — there, jax.devices() is the global list and safe)
        knob = os.environ.get("DIART_TPU_PLATFORM")
        if knob:
            # the knob is authoritative — apply it before first init (it
            # must beat a sitecustomize config pin, which shadows env vars)
            jax.config.update("jax_platforms", knob)
        platform = effective_platform()
        if platform.startswith("cpu"):
            # explicitly local: in-process init below is safe and cheap;
            # the post-init resize handles the device count
            probed: Optional[int] = n_devices
        else:
            # non-cpu OR unset (the default selection may still pick a
            # remote plugin — unknown is probed, not trusted)
            probed = _probe_default_backend(platform)
        if probed is None or probed < n_devices:
            jax.config.update("jax_num_cpu_devices", max(n_devices, 1))
            jax.config.update("jax_platforms", "cpu")

    if len(jax.devices()) < n_devices:
        if jax.process_count() > 1:
            raise RuntimeError(
                f"need {n_devices} devices but the {jax.process_count()}"
                f"-process group provides {len(jax.devices())}; virtual CPU "
                f"provisioning is a single-process development fallback"
            )
        import jax._src.xla_bridge as _xb

        _xb._clear_backends()
        _xb.get_backend.cache_clear()
        jax.config.update("jax_num_cpu_devices", max(n_devices, 1))
        jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            f"on platform {jax.devices()[0].platform}"
        )


def streams_mesh(n_devices: Optional[int] = None):
    """A 1-D ``streams`` mesh over ``n_devices`` devices (default: every
    device), provisioning virtual CPU devices when fewer real ones exist in
    single-process operation. Calls :func:`initialize_distributed` first, so
    a coordinator-configured multi-host launch gets the global mesh with no
    extra code."""
    import jax
    from jax.sharding import Mesh

    initialize_distributed()
    if n_devices is None:
        n_devices = len(jax.devices())
    else:
        provision_devices(n_devices)
    return Mesh(np.array(jax.devices()[:n_devices]), ("streams",))
