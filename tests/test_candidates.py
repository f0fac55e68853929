"""Candidate-generator unit tests: vectorised single-M batch vs scalar."""

import numpy as np

from platypus_tpu.candidates.cigar_gen import CandidateGenerator
from platypus_tpu.io.bam import BamFile
from platypus_tpu.io.fasta import FastaFile

from synth import SimHaplotype, make_reference, simulate_reads, write_synth_bam


def _generators(tmp_path, reads, ref_len):
    bam_path = write_synth_bam(tmp_path, reads, ref_len=ref_len)
    ref_path, _ = make_reference(tmp_path, length=ref_len, seed=11)
    ref = FastaFile(ref_path)
    bam = BamFile(bam_path)
    rs = bam.fetch("chr20", 0, ref_len)
    region = ("chr20", 0, ref_len)
    return rs, (CandidateGenerator(region, ref, 20, 10, 20),
                CandidateGenerator(region, ref, 20, 10, 20))


def test_single_m_batch_matches_scalar(tmp_path):
    """The vectorised single-M pass produces exactly the per-read scan's
    candidate dict (positions, alleles, support counts)."""
    ref_path, ref_seq = make_reference(tmp_path, length=9000, seed=11)
    variants = [(1500, 1, b"T" if ref_seq[1500] != ord("T") else b"C"),
                (1503, 1, b"A" if ref_seq[1503] != ord("A") else b"G"),  # MNP merge
                (3000, 1, b"G" if ref_seq[3000] != ord("G") else b"T"),
                (5000, 3, b"TAG")]
    hap = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap, SimHaplotype(ref_seq, [])], 1000, 8000,
                           coverage=12, error_rate=0.01, seed=3)
    rs, (gen_batch, gen_scalar) = _generators(tmp_path, reads, 9000)

    rows = np.arange(len(rs.pos))
    gen_batch.add_candidates_from_reads(rs, rows)
    for i in rows:
        if not rs.qc_fail[i]:
            gen_scalar._scan_read(rs, int(i))

    got = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
           for v in gen_batch.get_candidates()}
    want = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
            for v in gen_scalar.get_candidates()}
    assert got == want
    assert len(want) > 3  # the scan actually found things


def test_batch_respects_edge_flanks(tmp_path):
    """Mismatches within minFlank of a read end are ignored (both paths)."""
    ref_path, ref_seq = make_reference(tmp_path, length=9000, seed=11)
    # One SNP; reads placed so some carry it near an edge.
    pos = 4000
    alt = b"T" if ref_seq[pos] != ord("T") else b"C"
    hap = SimHaplotype(ref_seq, [(pos, 1, alt)])
    reads = simulate_reads([hap], 3900, 4110, coverage=25, seed=8)
    rs, (gen_batch, gen_scalar) = _generators(tmp_path, reads, 9000)

    rows = np.arange(len(rs.pos))
    gen_batch.add_candidates_from_reads(rs, rows)
    for i in rows:
        if not rs.qc_fail[i]:
            gen_scalar._scan_read(rs, int(i))
    got = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
           for v in gen_batch.get_candidates()}
    want = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
            for v in gen_scalar.get_candidates()}
    assert got == want
    key = (pos, bytes([ref_seq[pos]]), alt)
    assert got[key] > 0
    # Support is less than total reads covering the site (edge reads skip it).
    covering = sum(1 for r in reads if r["pos"] <= pos - 1 < r["pos"] + 100)
    assert got[key] < covering


def test_native_scan_matches_numpy_batch(tmp_path):
    """The C++ single-M scanner (native/src/scan.cpp) reproduces the numpy
    batch exactly — high error rate, N bases, mixed quals, reads straddling
    the reference-cache edges."""
    import pytest

    from platypus_tpu import native

    if native.load() is None:
        pytest.skip("native library unavailable")

    ref_path, ref_seq = make_reference(tmp_path, length=9000, seed=17)
    rng = np.random.default_rng(23)
    variants = [(p, 1, bytes([rng.choice([b for b in b"ACGT" if b != ref_seq[p]])]))
                for p in range(1200, 7800, 311)]
    hap = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap, SimHaplotype(ref_seq, [])], 150, 8800,
                           coverage=18, error_rate=0.05, seed=5)
    # Sprinkle Ns and low quals.
    for i, r in enumerate(reads):
        if i % 7 == 0:
            s = bytearray(r["seq"]); s[i % len(s)] = ord("N"); r["seq"] = bytes(s)
        if i % 5 == 0:
            q = bytearray(r["qual"]); q[i % len(q)] = 3; r["qual"] = bytes(q)
    rs, (gen_native, gen_numpy) = _generators(tmp_path, reads, 9000)

    rows = np.arange(len(rs.pos))
    c_lo = rs.cigar_off[rows]
    single = (rs.cigar_off[rows + 1] - c_lo) == 1
    words = rs.cigar_flat[c_lo[single]].astype(np.int64)
    is_m = (words & 0xF) == 0
    lens = words >> 4
    srows = rows[single][is_m & (lens >= 10)]
    mlens = lens[is_m & (lens >= 10)]
    assert len(srows) > 50

    zero = np.zeros(len(srows), np.int64)
    found = native.native_scan_m_segments(rs, srows, mlens, zero, zero,
                                          gen_native.ref_seq,
                                          gen_native.ref_seq_start, 10, 20)
    assert found is not None
    for pos, removed, added, count in found:
        gen_native._add_platypus_candidate(pos, removed, added, count=count)
    gen_numpy._scan_single_m_batch(rs, srows, mlens)

    got = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
           for v in gen_native.get_candidates()}
    want = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
            for v in gen_numpy.get_candidates()}
    assert got == want
    assert len(want) > 20


def test_indel_read_m_segments_match_scalar(tmp_path):
    """Reads with I/D CIGARs route their M segments through the batched
    native scan (offset read_off/ref_off); candidates match the pure scalar
    walk exactly, including SNPs on indel-bearing reads."""
    ref_path, ref_seq = make_reference(tmp_path, length=9000, seed=13)
    rng = np.random.default_rng(31)
    variants = [
        (2000, 0, b"ACT"),          # insertion
        (3000, 4, b""),             # deletion
        (3040, 1, b"T" if ref_seq[3040] != ord("T") else b"C"),  # SNP near D
        (5000, 2, b""),             # deletion
        (5030, 0, b"G"),            # insertion
    ]
    hap = SimHaplotype(ref_seq, variants)
    reads = simulate_reads([hap, SimHaplotype(ref_seq, [])], 1500, 6500,
                           coverage=15, error_rate=0.02, seed=9)
    rs, (gen_batch, gen_scalar) = _generators(tmp_path, reads, 9000)

    rows = np.arange(len(rs.pos))
    multi = (rs.cigar_off[rows + 1] - rs.cigar_off[rows]) > 1
    assert multi.sum() >= 20  # indel reads actually present

    gen_batch.add_candidates_from_reads(rs, rows)
    for i in rows:
        if not rs.qc_fail[i]:
            gen_scalar._scan_read(rs, int(i))
    got = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
           for v in gen_batch.get_candidates()}
    want = {(v.ref_pos, v.removed, v.added): v.n_supporting_reads
            for v in gen_scalar.get_candidates()}
    assert got == want
    assert any(len(r) != len(a) for _, r, a in got)  # indels found


def test_indel_walk_out_of_cache_deletion_falls_back(tmp_path):
    """A deletion reaching past the reference cache sends the whole read to
    the Python walk (file-backed access with the contig-end clamp) — the
    native walk must emit nothing for it, so there is no double count."""
    from platypus_tpu.io.bam import write_bam, BamFile
    from platypus_tpu.native import load as native_load, native_scan_indel_reads

    if native_load() is None:
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", np.uint8)
    seq = bytes(rng.choice(bases, size=40))
    reads = [
        # 20M 300D 20M: deletion fits in the 500-byte cache below.
        dict(name="ok", ref_id=0, pos=100, mapq=60, flag=0,
             cigar=[(0, 20), (2, 300), (0, 20)], seq=seq,
             qual=bytes([30] * 40)),
        # 20M 600D 20M: deletion reaches past the cache end.
        dict(name="far", ref_id=0, pos=100, mapq=60, flag=0,
             cigar=[(0, 20), (2, 600), (0, 20)], seq=seq,
             qual=bytes([30] * 40)),
    ]
    bam = str(tmp_path / "d.bam")
    write_bam(bam, [("chr20", 100_000)], reads)
    rs = BamFile(bam).fetch("chr20", 0, 100_000)

    ref_cache = bytes(rng.choice(bases, size=500))  # covers [0, 500)
    cands, msegs, py_rows = native_scan_indel_reads(
        rs, np.arange(2), ref_cache, 0, 10, True, True)
    # The in-cache deletion is emitted; the far one defers to Python.
    assert any(len(rem) == 300 and add == b"" for _, rem, add, _ in cands)
    assert not any(len(rem) == 600 for _, rem, add, _ in cands)
    assert list(py_rows) == [1]
    # The deferred row contributed no M segments either.
    assert set(msegs[0].tolist()) == {0}
