"""BAI auto-indexing: builder parity (native vs Python oracle), fetch
parity (indexed vs full scan), and the coordinate-sorted early exit.

The reference requires indexed BAMs (htslib refuses to fetch without a
.bai); platypus-tpu builds the missing index in one streaming pass instead
(io/bam.py:build_bai, native bgzf_bam.cpp:ptpu_bam_index), which also keeps
region fetches O(query) rather than O(file).
"""

import os

import numpy as np
import pytest

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam

from platypus_tpu.io.bam import BaiIndex, BamFile, build_bai
from platypus_tpu.native import load as native_load, native_bam_index


@pytest.fixture(scope="module")
def synth_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bai")
    ref_path, ref_seq = make_reference(tmp, length=60_000, seed=11)
    reads = simulate_reads([SimHaplotype(ref_seq, [(30_000, 1, b"T")])],
                           1000, 59_000, coverage=8, seed=12)
    bam = write_synth_bam(tmp, reads, ref_len=60_000)
    return bam


def test_python_and_native_builders_agree(synth_bam, tmp_path):
    py_bai = str(tmp_path / "py.bai")
    build_bai(synth_bam, py_bai)
    assert BaiIndex(py_bai) is not None  # parses as a valid BAI
    if native_load() is None:
        pytest.skip("native library not built")
    nat_bai = str(tmp_path / "nat.bai")
    assert native_bam_index(synth_bam, nat_bai)
    assert open(py_bai, "rb").read() == open(nat_bai, "rb").read()


def test_auto_index_on_open_and_fetch_parity(synth_bam, monkeypatch):
    bai = synth_bam + ".bai"
    if os.path.exists(bai):
        os.unlink(bai)

    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "0")
    scan = BamFile(synth_bam)
    assert scan.index is None

    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "1")
    indexed = BamFile(synth_bam)
    assert indexed.index is not None and os.path.exists(bai)

    for start, end in [(1000, 5000), (29_000, 31_000), (55_000, 59_000),
                       (59_500, 60_000)]:
        r_scan = scan.fetch("chr20", start, end, use_native=False)
        r_idx = indexed.fetch("chr20", start, end, use_native=False)
        r_nat = indexed.fetch("chr20", start, end)
        for name in ("pos", "end", "rlen", "mapq", "flag"):
            assert np.array_equal(getattr(r_scan, name), getattr(r_idx, name))
            assert np.array_equal(getattr(r_scan, name), getattr(r_nat, name))
        assert np.array_equal(r_scan.seq, r_idx.seq)
        assert np.array_equal(r_scan.seq, r_nat.seq)
    scan.close()
    indexed.close()


def test_unwritable_directory_falls_back_to_tempdir(synth_bam, tmp_path, monkeypatch):
    """When the BAM's directory rejects writes (read-only input trees), the
    index is built in the temp dir instead.  Simulated by failing the
    in-directory mkstemp — chmod can't make a directory unwritable under
    the root user this suite often runs as."""
    import shutil
    import tempfile

    ro_dir = tmp_path / "ro"
    ro_dir.mkdir()
    ro_bam = str(ro_dir / "reads.bam")
    shutil.copy(synth_bam, ro_bam)

    real_mkstemp = tempfile.mkstemp

    def deny_in_dir(*args, **kwargs):
        if kwargs.get("dir") is not None:
            raise OSError("read-only directory")
        return real_mkstemp(*args, **kwargs)

    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "1")
    monkeypatch.setattr(tempfile, "mkstemp", deny_in_dir)
    bf = BamFile(ro_bam)
    # Index built somewhere writable, and fetch works through it.
    assert bf.index is not None
    assert not os.path.exists(ro_bam + ".bai")
    rs = bf.fetch("chr20", 29_000, 31_000)
    assert len(rs.pos) > 0
    bf.close()


def test_unsorted_bam_is_not_indexed_and_fetch_stays_correct(tmp_path, monkeypatch):
    """A BAM whose records are NOT coordinate-sorted (even when the header
    claims SO:coordinate) must refuse indexing — a BAI over disorder plus
    the sorted-scan early exit would silently drop reads — and fall back to
    order-agnostic full scans that still return every overlapping read."""
    from platypus_tpu.io.bam import write_bam

    rng = np.random.default_rng(3)
    reads = []
    for i, pos in enumerate([5000, 1200, 9000, 300, 7000, 7000, 50]):
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=50))
        reads.append(dict(name=f"r{i}", ref_id=0, pos=pos, mapq=60, flag=0,
                          cigar=[(0, 50)], seq=seq, qual=bytes([30] * 50)))
    bam = str(tmp_path / "unsorted.bam")
    write_bam(bam, [("chr20", 20_000)], reads)

    with pytest.raises(ValueError, match="not coordinate-sorted"):
        build_bai(bam, str(tmp_path / "x.bai"))
    if native_load() is not None:
        assert not native_bam_index(bam, str(tmp_path / "y.bai"))

    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "1")
    bf = BamFile(bam)
    assert bf.index is None
    assert not bf.coordinate_sorted  # build failed -> order-agnostic scans
    rs = bf.fetch("chr20", 0, 20_000)
    assert sorted(rs.pos.tolist()) == sorted(r["pos"] for r in reads)
    rs2 = bf.fetch("chr20", 6000, 8000)
    assert sorted(rs2.pos.tolist()) == [7000, 7000]
    bf.close()


def test_indexed_fetch_fuzz_matches_full_scan(tmp_path, monkeypatch):
    """Randomised parity: random CIGARs (indels, clips, long deletions,
    contig-edge reads) and random query spans — the indexed fetch must
    return exactly the full-scan result (a bin or linear-index bug shows
    up as silently missing reads)."""
    from platypus_tpu.io.bam import write_bam

    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref_len = 400_000
    reads = []
    positions = np.sort(rng.integers(0, ref_len - 200, size=1500))
    for i, pos in enumerate(positions.tolist()):
        kind = rng.random()
        L = int(rng.integers(30, 150))
        if kind < 0.6:
            cigar = [(0, L)]
        elif kind < 0.75:
            a = L // 3
            cigar = [(0, a), (1, int(rng.integers(1, 6))), (0, L - a)]
            L = sum(l for op, l in cigar if op in (0, 1))
        elif kind < 0.9:
            a = L // 3
            cigar = [(0, a), (2, int(rng.integers(1, 5000))), (0, L - a)]
        else:
            s = int(rng.integers(1, 10))
            cigar = [(4, s), (0, L - s)]
        seq = bytes(rng.choice(bases, size=L))
        reads.append(dict(name=f"r{i}", ref_id=0, pos=int(pos), mapq=50,
                          flag=0, cigar=cigar, seq=seq,
                          qual=bytes([30] * L)))
    bam = str(tmp_path / "fuzz.bam")
    write_bam(bam, [("chr20", ref_len)], reads)

    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "0")
    scan = BamFile(bam)
    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "1")
    indexed = BamFile(bam)
    assert indexed.index is not None

    for _ in range(40):
        a = int(rng.integers(0, ref_len))
        b = a + int(rng.integers(1, 60_000))
        r_scan = scan.fetch("chr20", a, b, use_native=False)
        r_idx = indexed.fetch("chr20", a, b, use_native=False)
        r_nat = indexed.fetch("chr20", a, b)
        assert np.array_equal(r_scan.pos, r_idx.pos), (a, b)
        assert np.array_equal(r_scan.pos, r_nat.pos), (a, b)
        assert np.array_equal(r_scan.end, r_idx.end)
        assert np.array_equal(r_scan.seq, r_idx.seq)
        assert np.array_equal(r_scan.seq, r_nat.seq)
    scan.close()
    indexed.close()


def test_multi_chromosome_index_and_fetch(tmp_path, monkeypatch):
    """Two-contig BAM: the built BAI keeps per-reference bins/linear
    sections separate, fetches stay per-chromosome, and the sorted-scan
    early exit doesn't leak across contigs."""
    from platypus_tpu.io.bam import write_bam

    rng = np.random.default_rng(17)
    bases = np.frombuffer(b"ACGT", np.uint8)
    reads = []
    k = 0
    for ref_id, positions in ((0, [100, 5000, 30_000]),
                              (1, [50, 200, 40_000, 40_050])):
        for pos in positions:
            seq = bytes(rng.choice(bases, size=60))
            reads.append(dict(name=f"r{k}", ref_id=ref_id, pos=pos, mapq=60,
                              flag=0, cigar=[(0, 60)], seq=seq,
                              qual=bytes([30] * 60)))
            k += 1
    bam = str(tmp_path / "two.bam")
    write_bam(bam, [("chrA", 50_000), ("chrB", 50_000)], reads)

    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "1")
    bf = BamFile(bam)
    assert bf.index is not None
    assert sorted(bf.fetch("chrA", 0, 50_000).pos.tolist()) == [100, 5000, 30_000]
    assert sorted(bf.fetch("chrB", 0, 50_000).pos.tolist()) == [50, 200, 40_000, 40_050]
    assert bf.fetch("chrB", 150, 250, use_native=False).pos.tolist() == [200]
    assert bf.fetch("chrB", 150, 250).pos.tolist() == [200]
    # Unindexed full scan of the LATER chromosome must skip chrA records
    # (continue) and stop before the end of file only past the query.
    monkeypatch.setenv("PLATYPUS_TPU_AUTOINDEX", "0")
    os.unlink(bam + ".bai")
    scan = BamFile(bam)
    assert scan.index is None
    assert sorted(scan.fetch("chrB", 0, 50_000).pos.tolist()) == [50, 200, 40_000, 40_050]
    assert scan.fetch("chrA", 4000, 6000).pos.tolist() == [5000]
    bf.close()
    scan.close()
