"""Test configuration: force JAX onto a virtual 8-device CPU mesh so that
sharding/collective code paths compile and run without TPU hardware.

NB: the JAX_PLATFORMS env var is not honoured when the axon TPU plugin is
installed; jax.config.update('jax_platforms', ...) is, so we use that.
XLA_FLAGS must still be set before the first backend initialisation.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["PLATYPUS_TPU_PLATFORM"] = "cpu"  # spawned workers honour this

import jax

jax.config.update("jax_platforms", "cpu")
