"""Device-mesh helpers for stream-level data parallelism.

The engine scales out by sharding its stream batch over a ``streams`` mesh
axis (XLA inserts the collectives over ICI). These helpers provision the
devices — real chips when available, an N-virtual-device CPU mesh otherwise,
so multi-chip code paths run (tests, dry runs, single-chip dev boxes)
anywhere.
"""

from __future__ import annotations

import numpy as np

__all__ = ["provision_devices", "streams_mesh"]


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
    """
    import jax

    if len(jax.devices()) < n_devices:
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


def streams_mesh(n_devices: int):
    """A 1-D ``streams`` mesh over the first ``n_devices`` devices,
    provisioning virtual CPU devices when fewer real ones exist."""
    import jax
    from jax.sharding import Mesh

    provision_devices(n_devices)
    return Mesh(np.array(jax.devices()[:n_devices]), ("streams",))
