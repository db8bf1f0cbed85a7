"""Platform helpers.

The compute platform must be derived from the *effective default
device* (``jax.config.jax_default_device`` if set, else the default
backend): environments can force a TPU plugin into every process (e.g.
via sitecustomize), and tests redirect work to CPU by setting the
default device rather than by hiding the TPU.
"""

from __future__ import annotations

import jax


def compute_platform() -> str:
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def is_tpu() -> bool:
    return compute_platform() == "tpu"


def cpu_devices(n: int | None = None):
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]
