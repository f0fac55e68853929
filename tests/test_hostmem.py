"""Malloc tuning: applied on import, exported to children, and disableable."""

import os
import subprocess
import sys

from platypus_tpu.utils import hostmem


def test_tune_malloc_applied_and_idempotent():
    # The package __init__ already ran it; a second call is a cheap no-op.
    assert hostmem.tune_malloc() is True
    assert hostmem.tune_malloc() is True
    # Children inherit the thresholds through glibc's env parsing.
    assert os.environ.get("MALLOC_MMAP_THRESHOLD_") == str(hostmem._THRESHOLD)
    assert os.environ.get("MALLOC_TRIM_THRESHOLD_") == str(hostmem._THRESHOLD)


def test_tune_malloc_opt_out():
    env = dict(os.environ, PLATYPUS_TPU_NO_MALLOC_TUNE="1")
    env.pop("MALLOC_MMAP_THRESHOLD_", None)
    code = (
        "import os\n"
        "from platypus_tpu.utils.hostmem import tune_malloc\n"
        "assert tune_malloc() is False\n"
        "assert 'MALLOC_MMAP_THRESHOLD_' not in os.environ\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
