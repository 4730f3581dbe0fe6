"""Virtual-device provisioning for mesh code on single-chip hosts.

Multi-chip sharding is validated on host-platform fake devices
(SURVEY.md 4).  The catch in this environment: a TPU PJRT plugin may be
pre-registered (sitecustomize imports jax before user code), so env vars
set from outside are not honored — the platform override must happen
*in process* before the first backend use.  This helper is the single
implementation of that recipe (used by ``__graft_entry__``,
``bench.py``, and available to user scripts).
"""

from __future__ import annotations

import os


def ensure_virtual_devices(n_devices: int) -> bool:
    """Make sure this process can see ``n_devices`` JAX devices.

    If no backend has been initialized yet, provision a virtual
    ``n_devices``-device CPU platform (``XLA_FLAGS`` +
    ``jax_platforms=cpu`` before first backend use).  Returns True when
    the process now has enough devices; False means the backend is
    already bound to too few devices — the caller must re-exec in a
    fresh process whose first statements call this helper.
    """
    import jax

    try:
        from jax._src import xla_bridge as _xb

        initialized = _xb.backends_are_initialized()
    except Exception:  # pragma: no cover - private API moved
        initialized = jax.local_device_count() >= n_devices
    if not initialized:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # pragma: no cover
            pass
    return jax.local_device_count() >= n_devices
