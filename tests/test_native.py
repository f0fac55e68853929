"""Native C++ runtime parity tests: the ctypes library must reproduce the
pure-Python I/O plane exactly."""

import numpy as np
import pytest

from platypus_tpu.io.bam import BamFile
from platypus_tpu.io.readbuffer import QCOptions, _trim_good_reads, check_and_trim_reads
from platypus_tpu import native

S55 = "/root/reference/test/S55_test_realigned.bam"

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native library not built")

FIELDS = ["seq", "qual", "rlen", "pos", "end", "mapq", "flag", "chrom_id",
          "mate_chrom_id", "mate_pos", "insert_size", "cigar_flat", "cigar_off"]


def test_native_fetch_matches_python_full_scan():
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        py = bf.fetch(chrom, 0, length, use_native=False)
        nat = bf.fetch(chrom, 0, length, use_native=True)
    assert len(py) == len(nat) > 1000
    for f in FIELDS:
        assert np.array_equal(getattr(py, f), getattr(nat, f)), f


def test_native_fetch_matches_python_region():
    with BamFile(S55) as bf:
        chrom, _ = bf.references[0]
        full = bf.fetch(chrom, 0, bf.references[0][1], use_native=False)
        mid = int(np.median(full.pos))
        py = bf.fetch(chrom, mid, mid + 2500, use_native=False)
        nat = bf.fetch(chrom, mid, mid + 2500, use_native=True)
    assert len(py) == len(nat) > 0
    for f in FIELDS:
        assert np.array_equal(getattr(py, f), getattr(nat, f)), f


def test_native_trim_matches_python():
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        a = bf.fetch(chrom, 0, length, use_native=False)
        b = bf.fetch(chrom, 0, length, use_native=False)
    opts = QCOptions()
    # Run the full QC cascade twice, forcing the trimming step through
    # each implementation, and compare the resulting quals.
    import platypus_tpu.native as nat_mod

    good_a, _ = check_and_trim_reads(a, opts)  # native path (if loaded)
    saved = nat_mod._lib
    try:
        nat_mod._lib = None
        nat_mod._load_attempted = True
        good_b, _ = check_and_trim_reads(b, opts)  # forced python path
    finally:
        nat_mod._lib = saved
        nat_mod._load_attempted = True
    assert np.array_equal(good_a, good_b)
    assert np.array_equal(a.qual, b.qual)
