"""Tests for the host I/O plane: FASTA, BGZF, BAM parsing and read QC."""

import os

import numpy as np
import pytest

from platypus_tpu.io import bam as bam_mod
from platypus_tpu.io.bam import BamFile, ReadSet, write_bam
from platypus_tpu.io.bgzf import BGZFReader, BGZFWriter
from platypus_tpu.io.fasta import FastaFile, build_index
from platypus_tpu.io.readbuffer import QCOptions, build_sample_buffer, check_and_trim_reads

S55 = "/root/reference/test/S55_test_realigned.bam"


# ---------------------------------------------------------------------------
# BGZF
# ---------------------------------------------------------------------------

def test_bgzf_roundtrip(tmp_path):
    data = bytes(range(256)) * 5000  # > one 64k block
    path = str(tmp_path / "x.bgzf")
    with BGZFWriter(path) as w:
        w.write(data)
    with BGZFReader(path) as r:
        assert r.read_all() == data


def test_bgzf_virtual_seek(tmp_path):
    data = b"".join(b"%08d" % i for i in range(100000))
    path = str(tmp_path / "x.bgzf")
    with BGZFWriter(path) as w:
        w.write(data)
    with BGZFReader(path) as r:
        r.read(16)
        v = r.virtual_offset
        chunk1 = r.read(32)
        r.seek_virtual(v)
        chunk2 = r.read(32)
        assert chunk1 == chunk2 == data[16:48]


# ---------------------------------------------------------------------------
# FASTA
# ---------------------------------------------------------------------------

def test_fasta_index_and_fetch(tmp_path):
    seq = "ACGTACGTGGTTAACCGGATCGATCGGGGTACGTAGCTAG" * 10
    fa = tmp_path / "ref.fa"
    fa.write_text(">chr1 description\n" + "\n".join(seq[i : i + 60] for i in range(0, len(seq), 60)) + "\n>chr2\nNNNNACGT\n")
    build_index(str(fa))
    with FastaFile(str(fa)) as f:
        assert f.refs["chr1"].length == len(seq)
        assert f.get_sequence("chr1", 0, 10) == seq[:10].encode()
        assert f.get_sequence("chr1", 55, 125) == seq[55:125].encode()
        assert f.get_sequence("chr1", -5, 3) == seq[:3].encode()
        # End clamps to length-1 (reference convention: the final base of a
        # contig is never returned).
        assert f.get_sequence("chr1", len(seq) - 3, len(seq) + 10) == seq[-3:-1].encode()
        assert f.get_sequence("chr2", 0, 8) == b"NNNNACG"  # end clamps to len-1
        # Region cache must return identical results.
        f.set_cache_sequence("chr1", 50, 200)
        assert f.get_sequence("chr1", 55, 125) == seq[55:125].encode()
        assert f.get_character("chr1", 7) == seq[7].encode()


# ---------------------------------------------------------------------------
# BAM
# ---------------------------------------------------------------------------

def test_s55_header_and_samples():
    with BamFile(S55) as bf:
        assert len(bf.references) > 0
        names = [n for n, _ in bf.references]
        assert bf.sample_names()  # RG:SM or filename fallback
        assert all(isinstance(n, str) for n in names)


def test_s55_fetch_region():
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        rs = bf.fetch(chrom, 0, length)
        assert len(rs) > 100
        # Sequences decode to ACGTN alphabet only.
        bases = np.unique(rs.seq[rs.seq != 0])
        assert set(bases.tobytes()) <= set(b"ACGTN=MRSVWYHKDB")
        # Quality scores are sane phreds.
        valid = np.arange(rs.seq.shape[1])[None, :] < rs.rlen[:, None]
        assert rs.qual[valid].max() <= 93
        # end > pos for mapped reads.
        mapped = (rs.flag & bam_mod.FLAG_UNMAP) == 0
        assert np.all(rs.end[mapped] >= rs.pos[mapped])


def test_s55_indexed_fetch_matches_full_scan():
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        full = bf.fetch(chrom, 0, length)
        mid = int(np.median(full.pos))  # inside a real read cluster
        sub = bf.fetch(chrom, mid, mid + 2000)
    # Compare against a position filter over the full scan (overlap on the
    # original alignment span; pos here is already soft-clip adjusted, but
    # record order and identity must agree).
    assert len(sub) > 0
    assert set(map(tuple, np.stack([sub.pos, sub.rlen]).T.tolist())) <= set(
        map(tuple, np.stack([full.pos, full.rlen]).T.tolist())
    )


def test_bam_writer_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    reads = []
    rng = np.random.default_rng(0)
    for i in range(50):
        seq = bytes(rng.choice(list(b"ACGT"), size=100).tolist())
        reads.append(
            dict(
                name=f"r{i}",
                ref_id=0,
                pos=100 + 3 * i,
                mapq=60,
                flag=0,
                cigar=[(0, 100)],
                seq=seq,
                qual=[30] * 100,
            )
        )
    write_bam(path, [("chrT", 10000)], reads)
    with BamFile(path) as bf:
        rs = bf.fetch("chrT", 0, 10000)
        assert len(rs) == 50
        assert rs.pos[0] == 100
        assert bytes(rs.seq[0, :100]) == reads[0]["seq"]
        assert rs.rlen.tolist() == [100] * 50
        assert bf.sample_names() == ["SAMPLE1"]


def test_bam_softclip_pos_adjustment(tmp_path):
    path = str(tmp_path / "sc.bam")
    reads = [
        dict(name="r0", ref_id=0, pos=500, mapq=60, flag=0,
             cigar=[(4, 10), (0, 90)], seq=b"A" * 100, qual=[30] * 100),
    ]
    write_bam(path, [("chrT", 10000)], reads)
    with BamFile(path) as bf:
        rs = bf.fetch("chrT", 0, 10000)
        assert rs.pos[0] == 490      # shifted left by the leading soft clip
        assert rs.end[0] == 500 + 90  # end from the unadjusted position


# ---------------------------------------------------------------------------
# QC / trimming
# ---------------------------------------------------------------------------

def _mk_readset(specs):
    """Build a ReadSet from a list of dicts via the BAM writer layer."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.bam")
        write_bam(path, [("chrT", 100000)], specs)
        with BamFile(path) as bf:
            return bf.fetch("chrT", 0, 100000)


def test_qc_filters():
    base = dict(ref_id=0, mapq=60, cigar=[(0, 50)], seq=b"A" * 50, qual=[30] * 50)
    specs = [
        dict(base, name="ok", pos=10, flag=0),
        dict(base, name="lowmapq", pos=20, flag=0, mapq=5),
        dict(base, name="secondary", pos=30, flag=256),
        dict(base, name="dupflag", pos=40, flag=1024),
        dict(base, name="lowqual", pos=50, flag=0, qual=[5] * 50),
        dict(base, name="dup1", pos=60, flag=0),
        dict(base, name="dup2", pos=60, flag=0),  # same pos+rlen, unpaired
    ]
    rs = _mk_readset(specs)
    opts = QCOptions()
    good, counts = check_and_trim_reads(rs, opts)
    assert good.tolist() == [True, False, False, False, False, True, False]
    assert counts["low_map_qual"] == 1
    assert counts["duplicate"] == 2
    assert counts["low_qual_bases"] == 1
    # QC-fail marks: all the failures here set the flag.
    assert rs.qc_fail.tolist() == [False, True, True, True, True, False, True]


def test_qc_mate_filters_not_qcfailed():
    base = dict(ref_id=0, mapq=60, cigar=[(0, 50)], seq=b"A" * 50, qual=[30] * 50)
    specs = [
        # paired, mate unmapped
        dict(base, name="m1", pos=10, flag=1 | 8),
        # paired, not proper pair
        dict(base, name="m2", pos=20, flag=1, mate_ref_id=0, mate_pos=5000),
    ]
    rs = _mk_readset(specs)
    good, counts = check_and_trim_reads(rs, QCOptions())
    assert good.tolist() == [False, False]
    # These land in the bad pile *without* the QC-fail mark, so they still
    # contribute alignment likelihoods (reference cwindow.pyx:367-377).
    assert rs.qc_fail.tolist() == [False, False]
    assert counts["mate_unmapped"] == 1
    assert counts["mate_distant"] == 1


def test_trim_tails_and_softclip():
    specs = [
        # Low-quality tail inside a pure-match read.
        dict(name="tail", ref_id=0, pos=10, mapq=60, flag=0,
             cigar=[(0, 50)], seq=b"C" * 50, qual=[30] * 47 + [4, 4, 4]),
        # Soft clips at both ends.
        dict(name="clip", ref_id=0, pos=210, mapq=60, flag=0,
             cigar=[(4, 5), (0, 40), (4, 5)], seq=b"C" * 50, qual=[30] * 50),
    ]
    rs = _mk_readset(specs)
    good, _ = check_and_trim_reads(rs, QCOptions())
    assert good.all()
    # Trailing low-qual run zeroed, stops at the first good base.
    assert rs.qual[0, 47:].tolist() == [0, 0, 0]
    assert rs.qual[0, 46] == 30
    # Soft-clipped head and tail zeroed; middle untouched.
    assert rs.qual[1, :5].tolist() == [0] * 5
    assert rs.qual[1, 45:].tolist() == [0] * 5
    assert rs.qual[1, 5:45].tolist() == [30] * 40


def test_window_slicing():
    base = dict(ref_id=0, mapq=60, cigar=[(0, 50)], seq=b"G" * 50, qual=[30] * 50)
    specs = [dict(base, name=f"r{i}", pos=100 + 10 * i, flag=0) for i in range(20)]
    rs = _mk_readset(specs)
    buf = build_sample_buffer("s", rs, QCOptions())
    sl = buf.window_slice(200, 260)
    got = [(int(p), int(e)) for p, e in zip(buf.good.pos[sl], buf.good.end[sl])]
    # Reads overlapping [200, 260): pos in [150..250] with end > 200.
    expected = [
        (int(p), int(e))
        for p, e in zip(rs.pos, rs.end)
        if p < 260 and e > 200
    ]
    assert got == expected
    assert buf.count_reads_covering_region(200, 201) == sum(
        1 for p, e in zip(rs.pos, rs.end) if p < 201 and e > 200
    )


def test_batched_coverage_counts_match_scalar():
    """count_reads_covering_positions == count_reads_covering_region(p, p+1)
    for every position, including before/after all reads and deletion-ish
    gaps (variable read spans)."""
    rng = np.random.default_rng(13)
    specs = []
    for i in range(60):
        ln = int(rng.integers(20, 80))
        specs.append(dict(
            name=f"r{i}", ref_id=0, pos=int(rng.integers(50, 900)), flag=0,
            mapq=60, cigar=[(0, ln)], seq=b"A" * ln, qual=[30] * ln,
        ))
    rs = _mk_readset(specs)
    buf = build_sample_buffer("s", rs, QCOptions())
    positions = np.arange(0, 1100, 7, dtype=np.int64)
    batched = buf.count_reads_covering_positions(positions)
    for p, c in zip(positions, batched):
        assert int(c) == buf.count_reads_covering_region(int(p), int(p) + 1), p


def test_worker_platform_flag_plumbed():
    import platypus_tpu.cli as cli

    cfg = cli.build_config([
        "--bamFiles=x.bam", "--refFile=r.fa", "--workerPlatform=cpu",
        "--nCPU=3", "-o", "out.vcf",
    ])
    assert cfg.worker_platform == "cpu"
    assert cfg.n_cpu == 3
    # Round-trips through the resume/spawn serialisation.
    from platypus_tpu.config import PlatypusConfig

    assert PlatypusConfig.from_json(cfg.to_json()).worker_platform == "cpu"


def test_fused_split_sort_matches_split_then_sort():
    """build_sample_buffer's fused split+sort gather must be row-identical
    to the naive split-then-stable-sort composition, including when leading
    soft clips de-sort the adjusted positions (readbuffer.py)."""
    rng = __import__("numpy").random.default_rng(11)
    specs = []
    for i in range(60):
        pos = int(rng.integers(100, 2000))
        clip = int(rng.integers(0, 12))
        cigar = ([(4, clip)] if clip else []) + [(0, 50 - clip)]
        mapq = 60 if rng.random() > 0.2 else 5   # ~20% fail QC
        specs.append(dict(name=f"r{i}", ref_id=0, pos=pos, mapq=mapq,
                          flag=0, cigar=cigar, seq=b"A" * 50,
                          qual=[30] * 50))
    specs.sort(key=lambda s: s["pos"])  # BAM coordinate order (raw pos)
    rs = _mk_readset(specs)
    import numpy as np

    from platypus_tpu.io.readbuffer import (SampleReadBuffer,
                                            build_sample_buffer,
                                            check_and_trim_reads)

    rs2 = _mk_readset(specs)
    buf = build_sample_buffer("s", rs, QCOptions())
    good_mask, counts = check_and_trim_reads(rs2, QCOptions())
    naive = SampleReadBuffer("s", rs2.take(np.nonzero(good_mask)[0]),
                             rs2.take(np.nonzero(~good_mask)[0]),
                             None, counts)
    for mine, ref in ((buf.good, naive.good), (buf.bad, naive.bad)):
        assert np.array_equal(mine.pos, ref.pos)
        assert np.array_equal(mine.seq, ref.seq)
        assert np.array_equal(mine.qual, ref.qual)
        assert np.array_equal(mine.flag, ref.flag)
        assert np.array_equal(mine.cigar_flat, ref.cigar_flat)
        assert np.array_equal(mine.cigar_off, ref.cigar_off)


def test_readset_padding_contract_producers_and_trims():
    """The ReadSet zero-padding contract (bam.py ReadSet docstring) must
    hold for every producer and survive in-place quality trims — the
    minBaseQual>=1 QC fast path counts good bases with no rlen mask."""
    # Both BAM decode paths on real data.
    with BamFile(S55) as bf:
        chrom, length = bf.references[0]
        for use_native in (False, True):
            rs = bf.fetch(chrom, 0, length, use_native=use_native)
            rs.check_padding()
            # After full QC + trimming the contract must still hold.
            check_and_trim_reads(rs, QCOptions())
            rs.check_padding()
    # Compressed-mode lazy materialisation preserves it too.
    with BamFile(S55) as bf:
        rs = bf.fetch(chrom, 0, length)
    ref = b"A" * (int(rs.end.max()) + 1)
    rs2 = rs.take(np.arange(min(len(rs), 64)))
    rs2.compress_in_memory(ref, 0)
    seq, qual = rs2.seq_qual_rows(np.arange(len(rs2)))
    cols = np.arange(seq.shape[1])[None, :]
    pad = cols >= rs2.rlen[:, None]
    assert not seq[pad].any() and not qual[pad].any()
    # And the checker actually detects a violation.
    rs.qual[0, int(rs.rlen[0]):] = 1
    with pytest.raises(AssertionError):
        rs.check_padding()


def test_zero_span_read_endpos_clamp(tmp_path):
    """htslib bam_endpos semantics: a fully-soft-clipped (zero reference
    span) record still occupies one base — it is fetched when pos == start
    and its ReadSet.end is pos + 1, in BOTH decoders."""
    from platypus_tpu.io.bam import BamFile
    from synth import write_synth_bam

    import platypus_tpu.native as native

    reads = [
        dict(name="clip", ref_id=0, pos=500, mapq=40, flag=0,
             cigar=[(4, 10)], seq=b"ACGTACGTAC", qual=[30] * 10),
        dict(name="normal", ref_id=0, pos=505, mapq=40, flag=0,
             cigar=[(0, 10)], seq=b"ACGTACGTAC", qual=[30] * 10),
    ]
    bam = write_synth_bam(str(tmp_path), reads, ref_len=2000)
    variants = [False] + ([True] if native.load() is not None else [])
    for use_native in variants:
        with BamFile(bam) as bf:
            rs = bf.fetch("chr20", 500, 600, use_native=use_native)
            assert len(rs) == 2, (use_native, len(rs))
            clip_row = int(np.argmin(rs.pos))  # leading clip shifts pos to 490
            # Zero ref span -> end == stored_pos + 1 (bam_endpos clamp).
            assert rs.end[clip_row] == 501, (use_native, rs.end.tolist())
            # Window starting AT the occupied base still fetches it.
            rs2 = bf.fetch("chr20", 500, 501, use_native=use_native)
            assert (rs2.end - 1 == 500).any(), (use_native, rs2.end.tolist())


def test_seq_qual_rows_open_slices(tmp_path):
    """Compressed-mode seq_qual_rows must honour open-ended slices."""
    import numpy as np

    from platypus_tpu.io.bam import BamFile
    from synth import make_reference, write_synth_bam

    ref_path, ref_seq = make_reference(str(tmp_path), length=3000, seed=5)
    reads = [dict(name=f"r{i}", ref_id=0, pos=1000 + 7 * i, mapq=40, flag=0,
                  cigar=[(0, 50)],
                  seq=bytes(ref_seq[1000 + 7 * i:1000 + 7 * i + 50]),
                  qual=[30] * 50)
             for i in range(8)]
    bam = write_synth_bam(str(tmp_path), reads, ref_len=3000)
    with BamFile(bam) as bf:
        rs = bf.fetch("chr20", 900, 1500)
    dense_seq = rs.seq.copy()
    rs.compress_in_memory(ref_seq.tobytes(), 0)
    for sl in (slice(None), slice(3, None), slice(None, 4), slice(2, 7)):
        seq, _qual = rs.seq_qual_rows(sl)
        np.testing.assert_array_equal(seq, dense_seq[sl])
