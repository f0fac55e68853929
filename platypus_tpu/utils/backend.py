"""Backend pinning helpers.

The engine must be able to answer "is this process pinned to the CPU
backend?" WITHOUT importing jax or initialising an XLA client: a
CPU-pinned run takes the native kernels everywhere (engine/score.py,
native/), and on hosts whose sitecustomize pre-imports jax for a TPU
plugin, even asking `jax.default_backend()` costs a backend
initialisation the run never needs.
"""

from __future__ import annotations

import os


def cpu_pinned() -> bool:
    """True when this process's backend is explicitly pinned to cpu via
    PLATYPUS_TPU_PLATFORM or JAX_PLATFORMS.  Answerable from the
    environment alone — never imports jax, never initialises a backend."""
    if os.environ.get("PLATYPUS_TPU_PLATFORM") == "cpu":
        return True
    return os.environ.get("JAX_PLATFORMS", "") == "cpu"
